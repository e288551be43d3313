"""Diarization clustering backend (behavioral port of FunASR
``funasr/models/campplus/cluster_backend.py``: spectral clustering (<2048 chunks or
oracle k) / UMAP-HDBSCAN for large sets, then cosine merge at 0.78).

UMAP is an optional dependency; when absent, large sets fall back to spectral
clustering (slower O(N^3) eigendecomposition, same labels contract).
"""

from __future__ import annotations

import numpy as np
import scipy.linalg
import sklearn.metrics
from sklearn.cluster import k_means


class SpectralCluster:
    """Adapted p-pruned unnormalized spectral clustering (speechbrain lineage)."""

    def __init__(self, min_num_spks: int = 1, max_num_spks: int = 15,
                 pval: float = 0.022):
        self.min_num_spks = min_num_spks
        self.max_num_spks = max_num_spks
        self.pval = pval

    def __call__(self, x, oracle_num=None):
        sim = sklearn.metrics.pairwise.cosine_similarity(x, x)
        pruned = self._p_prune(sim)
        sym = 0.5 * (pruned + pruned.T)
        lap = self._laplacian(sym)
        emb, k = self._spectral_embeddings(lap, oracle_num)
        _, labels, _ = k_means(emb, k, n_init=10)
        return labels

    def _p_prune(self, a):
        pval = max(self.pval, 6.0 / a.shape[0]) if a.shape[0] * self.pval < 6 \
            else self.pval
        n_zero = int((1 - pval) * a.shape[0])
        for i in range(a.shape[0]):
            low = np.argsort(a[i, :])[:n_zero]
            a[i, low] = 0
        return a

    @staticmethod
    def _laplacian(m):
        m[np.diag_indices(m.shape[0])] = 0
        d = np.diag(np.sum(np.abs(m), axis=1))
        return d - m

    def _spectral_embeddings(self, lap, k_oracle):
        lambdas, eig_vecs = scipy.linalg.eigh(lap)
        if k_oracle is not None:
            k = k_oracle
        else:
            gaps = np.diff(lambdas[self.min_num_spks - 1: self.max_num_spks + 1])
            k = int(np.argmax(gaps)) + self.min_num_spks
        return eig_vecs[:, :k], k


class UmapHdbscan:
    def __init__(self, n_neighbors: int = 20, n_components: int = 60,
                 min_samples: int = 10, min_cluster_size: int = 10,
                 metric: str = "cosine"):
        self.n_neighbors = n_neighbors
        self.n_components = n_components
        self.min_samples = min_samples
        self.min_cluster_size = min_cluster_size
        self.metric = metric

    def __call__(self, x):
        import umap.umap_ as umap
        from sklearn.cluster import HDBSCAN
        emb = umap.UMAP(
            n_neighbors=self.n_neighbors,
            min_dist=0.0,
            n_components=min(self.n_components, x.shape[0] - 2),
            metric=self.metric,
        ).fit_transform(x)
        return HDBSCAN(min_samples=self.min_samples,
                       min_cluster_size=self.min_cluster_size).fit_predict(emb)


class ClusterBackend:
    """labels = cb(embeddings (N, C), oracle_num=None); <20 chunks -> single speaker."""

    def __init__(self, merge_thr: float = 0.78, **kwargs):
        self.merge_thr = merge_thr
        self.spectral_cluster = SpectralCluster()
        self.umap_hdbscan_cluster = UmapHdbscan()

    def __call__(self, x, oracle_num=None, **params):
        x = np.asarray(x)
        assert x.ndim == 2
        if x.shape[0] < 20:
            return np.zeros(x.shape[0], dtype="int")
        if x.shape[0] < 2048 or oracle_num is not None:
            labels = self.spectral_cluster(x, oracle_num)
        else:
            try:
                labels = self.umap_hdbscan_cluster(x)
            except ImportError:
                labels = self.spectral_cluster(x, oracle_num)
        if oracle_num is None and self.merge_thr is not None:
            labels = self.merge_by_cos(labels, x, self.merge_thr)
        return labels

    @staticmethod
    def merge_by_cos(labels, embs, cos_thr: float):
        assert 0 < cos_thr <= 1
        labels = np.asarray(labels).copy()
        while True:
            spk_num = labels.max() + 1
            if spk_num == 1:
                break
            centers = np.stack([embs[labels == i].mean(0) for i in range(spk_num)])
            centers = centers / np.linalg.norm(centers, axis=1, keepdims=True)
            affinity = np.triu(centers @ centers.T, 1)
            i, j = np.unravel_index(np.argmax(affinity), affinity.shape)
            if affinity[i, j] < cos_thr:
                break
            labels[labels == j] = i
            labels[labels > j] -= 1
        return labels
