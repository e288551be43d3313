"""Beam search for AR attention decoders.

Counterpart of FunASR ``funasr/models/transformer/search.py`` (espnet BeamSearch) —
redesigned device-friendly: the per-step scorer is a jitted batched whole-prefix
decoder call over (beam,) hypotheses with bucketed prefix lengths; the hypothesis
bookkeeping stays host-side. Also ``BeamSearchPara`` (reference ``funasr/models/
paraformer/search.py``) for rescoring NAR am_scores.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from funasr_tpu.utils.bucket import bucket_length


@dataclass
class Hypothesis:
    yseq: List[int]
    score: float = 0.0
    states: dict = field(default_factory=dict)


def beam_search(decoder, params, memory, memory_mask, sos: int, eos: int,
                beam_size: int = 10, max_len: Optional[int] = None,
                penalty: float = 0.0, maxlenratio: float = 0.0,
                minlenratio: float = 0.0, lm=None, lm_params=None,
                lm_weight: float = 0.3,
                hotword_scorer=None) -> List[Hypothesis]:
    """memory: (1, T, D) single utterance. Returns sorted hypotheses.

    ``lm``/``lm_params``/``lm_weight``: shallow fusion with a language model
    exposing ``score_step(params, ys, ys_len) -> (n, V) next-token log-probs``
    (TransformerLM / SeqRNNLM); combined score is ``am + lm_weight * lm``
    (reference ``funasr/models/transformer/search.py`` weighted-scorer
    semantics with the full_scorers {decoder, lm} set).

    ``hotword_scorer``: decode-time contextual biasing (the reference C++
    WFST bias-LM role, ``runtime/onnxruntime/src/bias-lm.cpp``) — an
    Aho-Corasick ``HotwordScorer`` adding incremental credit along hotword
    paths with rollback, tracked per hypothesis in ``Hypothesis.states``.
    """
    t_mem = int(np.asarray(memory_mask).sum())
    max_len = max_len or (int(t_mem * maxlenratio) if maxlenratio > 0 else t_mem)
    max_len = max(max_len, 2)
    min_len = int(t_mem * minlenratio)

    hyps = [Hypothesis(yseq=[sos], score=0.0)]
    ended: List[Hypothesis] = []
    for step in range(max_len):
        n = len(hyps)
        lmax = bucket_length(step + 1, minimum=8, multiple=8)
        ys = np.zeros((n, lmax), np.int32)
        ylen = np.zeros((n,), np.int32)
        for i, h in enumerate(hyps):
            ys[i, : len(h.yseq)] = h.yseq
            ylen[i] = len(h.yseq)
        mem = jnp.repeat(memory, n, axis=0)
        mmask = jnp.repeat(memory_mask, n, axis=0)
        logp = np.asarray(decoder.score_step(params, jnp.asarray(ys),
                                             jnp.asarray(ylen), mem, mmask))
        if lm is not None and lm_weight != 0.0:
            lm_logp = np.asarray(lm.score_step(lm_params, jnp.asarray(ys),
                                               jnp.asarray(ylen)))
            logp = logp + lm_weight * lm_logp
        if hotword_scorer is not None:
            v = logp.shape[-1]
            logp = np.array(logp)  # device arrays arrive read-only
            for i, h in enumerate(hyps):
                node = h.states.get("hw", hotword_scorer.init_state())
                logp[i] = logp[i] + hotword_scorer.score_step(node, v)
        cand: List[Hypothesis] = []
        for i, h in enumerate(hyps):
            top = np.argsort(-logp[i])[: beam_size]
            for tok in top:
                states = dict(h.states)
                if hotword_scorer is not None:
                    node = h.states.get("hw", hotword_scorer.init_state())
                    states["hw"] = hotword_scorer.advance(node, int(tok))
                cand.append(Hypothesis(yseq=h.yseq + [int(tok)],
                                       score=h.score + float(logp[i][tok]),
                                       states=states))
        cand.sort(key=lambda h: h.score, reverse=True)
        hyps = []
        for h in cand[: beam_size * 2]:
            if h.yseq[-1] == eos:
                if len(h.yseq) - 2 >= min_len:
                    h.score += penalty * len(h.yseq)
                    ended.append(h)
            else:
                hyps.append(h)
            if len(hyps) >= beam_size:
                break
        if not hyps:
            break
    for h in hyps:  # force-end leftovers
        ended.append(Hypothesis(yseq=h.yseq + [eos], score=h.score))
    ended.sort(key=lambda h: h.score / max(len(h.yseq), 1), reverse=True)
    return ended


def beam_search_para(am_scores, beam_size: int = 5, penalty: float = 0.0):
    """NAR rescoring beam over per-position am log-probs (reference BeamSearchPara):
    explores top-k tokens per position jointly. am_scores: (L, V) np."""
    l, v = am_scores.shape
    beams = [([], 0.0)]
    for t in range(l):
        top = np.argsort(-am_scores[t])[: beam_size]
        new = []
        for seq, sc in beams:
            for tok in top:
                new.append((seq + [int(tok)], sc + float(am_scores[t][tok])))
        new.sort(key=lambda x: x[1], reverse=True)
        beams = new[: beam_size]
    return [Hypothesis(yseq=seq, score=sc + penalty * len(seq))
            for seq, sc in beams]
