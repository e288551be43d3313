"""Training-stack tests: dataset/sampler/dataloader, a few sharded train steps
(loss decreases), checkpoint save/resume, n-best averaging."""

import json
import os
import wave

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

TOKENS = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i) for i in range(20)] + ["<unk>"]


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("traindata")
    rng = np.random.default_rng(0)
    lines = []
    for i in range(12):
        n = rng.integers(8000, 16000)
        wav = (rng.standard_normal(n) * 0.1 * 32767).astype(np.int16)
        path = d / f"utt{i}.wav"
        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(wav.tobytes())
        text = "".join(TOKENS[3 + int(x)] for x in rng.integers(0, 20, 4))
        lines.append({"source": str(path), "target": text,
                      "source_len": int(n), "target_len": 4, "key": f"utt{i}"})
    with open(d / "train.jsonl", "w") as f:
        for line in lines:
            f.write(json.dumps(line, ensure_ascii=False) + "\n")
    return d


def _build(tmpdir):
    from funasr_tpu.frontends.wav_frontend import WavFrontend
    from funasr_tpu.models.paraformer.model import Paraformer
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer

    tok = CharTokenizer(token_list=list(TOKENS))
    frontend = WavFrontend(fs=16000, lfr_m=7, lfr_n=6, n_mels=80, dither=0.0)
    model = Paraformer(
        input_size=560, vocab_size=len(TOKENS),
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, kernel_size=5, dropout_rate=0.0),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                          att_layer_num=2, kernel_size=5, sanm_shfit=0),
        predictor_conf=dict(idim=16, l_order=1, r_order=1, tail_threshold=0.45),
        sos=1, eos=2, predictor_bias=1, sampling_ratio=0.0)
    return model, frontend, tok


def test_dataset_and_sampler(data_dir):
    from funasr_tpu.datasets.audio_datasets.datasets import AudioDataset
    from funasr_tpu.datasets.audio_datasets.samplers import BatchSampler
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer

    tok = CharTokenizer(token_list=list(TOKENS))
    ds = AudioDataset(index_ds="IndexDSJsonl",
                      index_ds_conf={"path": str(data_dir / "train.jsonl")},
                      tokenizer=tok)
    assert len(ds) == 12
    item = ds[0]
    assert item["speech_lengths"] > 0 and item["text_lengths"] == 4

    sampler = BatchSampler(ds, batch_size=4, batch_type="example", shuffle=True)
    batches = list(sampler)
    assert sum(len(b) for b in batches) == 12

    tok_sampler = BatchSampler(ds, batch_size=40000, batch_type="token")
    batches = list(tok_sampler)
    assert sum(len(b) for b in batches) == 12

    batch = ds.collator([ds[i] for i in batches[0]])
    assert batch["speech"].ndim == 2 and batch["text"].ndim == 2


def test_train_loop_and_resume(data_dir, tmp_path):
    import optax
    from funasr_tpu.datasets.audio_datasets.datasets import AudioDataset
    from funasr_tpu.datasets.audio_datasets.samplers import BatchSampler
    from funasr_tpu.datasets.dataloader_entry import DataLoader
    from funasr_tpu.train_utils.average_nbest_models import average_checkpoints
    from funasr_tpu.train_utils.trainer import Trainer
    from funasr_tpu.parallel.sharding import make_mesh

    model, frontend, tok = _build(tmp_path)
    ds = AudioDataset(index_ds="IndexDSJsonl",
                      index_ds_conf={"path": str(data_dir / "train.jsonl")},
                      tokenizer=tok)
    loader = DataLoader(ds, BatchSampler(ds, batch_size=4, shuffle=False))

    out = str(tmp_path / "exp")
    mesh = make_mesh(2, model=1)
    trainer = Trainer(model, optax.adam(1e-3), frontend=frontend, output_dir=out,
                      max_epoch=2, log_interval=1, save_checkpoint_interval=0,
                      mesh=mesh)
    params = model.init_params(jax.random.PRNGKey(0))
    params = trainer.run(params, loader, loader)

    # loss decreased over the logged steps
    logs = [json.loads(line) for line in open(os.path.join(out, "train.log.jsonl"))]
    assert logs[-1]["loss"] < logs[0]["loss"]

    # resume: new trainer picks up epoch+step
    trainer2 = Trainer(model, optax.adam(1e-3), frontend=frontend, output_dir=out,
                       max_epoch=2, mesh=mesh)
    p2 = model.init_params(jax.random.PRNGKey(1))
    p2, _ = trainer2.resume_checkpoint(p2, trainer2.tx.init(p2))
    assert trainer2.start_epoch == 2

    avg_path = average_checkpoints(out, 2)
    assert os.path.exists(avg_path)


def test_trainer_fsdp_sharding(data_dir, tmp_path):
    """++sharding=fsdp shards large params over the data axis (ZeRO-3 role)."""
    import optax
    from funasr_tpu.datasets.audio_datasets.datasets import AudioDataset
    from funasr_tpu.datasets.audio_datasets.samplers import BatchSampler
    from funasr_tpu.datasets.dataloader_entry import DataLoader
    from funasr_tpu.parallel.sharding import fsdp_param_shardings, make_mesh
    from funasr_tpu.train_utils.trainer import Trainer

    model, frontend, tok = _build(tmp_path)
    ds = AudioDataset(index_ds="IndexDSJsonl",
                      index_ds_conf={"path": str(data_dir / "train.jsonl")},
                      tokenizer=tok)
    loader = DataLoader(ds, BatchSampler(ds, batch_size=4, shuffle=False))

    mesh = make_mesh(4, model=1)
    out = str(tmp_path / "exp_fsdp")
    trainer = Trainer(model, optax.adam(1e-3), frontend=frontend,
                      output_dir=out, max_epoch=1, log_interval=1,
                      save_checkpoint_interval=0, mesh=mesh, sharding="fsdp")
    params = model.init_params(jax.random.PRNGKey(0))
    # the policy must actually shard something over "data" at these sizes
    specs = fsdp_param_shardings(params, mesh, min_size=256)
    sharded_any = any(
        "data" in (leaf.spec or ())
        for leaf in jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: hasattr(x, "spec")))
    assert sharded_any, "fsdp policy sharded nothing over the data axis"
    params = trainer.run(params, loader, loader)
    logs = [json.loads(line)
            for line in open(os.path.join(out, "train.log.jsonl"))]
    assert np.isfinite(logs[-1]["loss"])


def test_trainer_sp_sharding(data_dir, tmp_path):
    """++sharding=sp shards the feature time dim over the "model" axis
    (sequence/context parallelism for long-audio training) and trains to the
    same loss trajectory as plain dp."""
    import optax
    from funasr_tpu.datasets.audio_datasets.datasets import AudioDataset
    from funasr_tpu.datasets.audio_datasets.samplers import BatchSampler
    from funasr_tpu.datasets.dataloader_entry import DataLoader
    from funasr_tpu.parallel.sharding import batch_shardings_sp, make_mesh
    from funasr_tpu.train_utils.trainer import Trainer

    model, frontend, tok = _build(tmp_path)
    ds = AudioDataset(index_ds="IndexDSJsonl",
                      index_ds_conf={"path": str(data_dir / "train.jsonl")},
                      tokenizer=tok)
    loader = DataLoader(ds, BatchSampler(ds, batch_size=4, shuffle=False))

    mesh = make_mesh(2, model=2)
    # spec sanity: rank-3 features get (data, model, None); rank-2 get (data,)
    specs = batch_shardings_sp(mesh, {
        "speech": np.zeros((4, 32, 560), np.float32),
        "text": np.zeros((4, 6), np.int32)})
    assert specs["speech"].spec == jax.sharding.PartitionSpec(
        "data", "model", None)
    assert specs["text"].spec == jax.sharding.PartitionSpec("data", None)

    out = str(tmp_path / "exp_sp")
    trainer = Trainer(model, optax.adam(1e-3), frontend=frontend,
                      output_dir=out, max_epoch=1, log_interval=1,
                      save_checkpoint_interval=0, mesh=mesh, sharding="sp")
    params = model.init_params(jax.random.PRNGKey(0))
    params = trainer.run(params, loader, loader)
    logs = [json.loads(line)
            for line in open(os.path.join(out, "train.log.jsonl"))]
    assert np.isfinite(logs[-1]["loss"])
    assert logs[-1]["loss"] < logs[0]["loss"]


def test_trainer_midepoch_resume(data_dir, tmp_path):
    """A mid-epoch step checkpoint resumes into the SAME epoch and skips the
    consumed batches (no batch re-seen), per reference trainer.py:287-366."""
    import optax
    from funasr_tpu.datasets.audio_datasets.datasets import AudioDataset
    from funasr_tpu.datasets.audio_datasets.samplers import BatchSampler
    from funasr_tpu.datasets.dataloader_entry import DataLoader
    from funasr_tpu.parallel.sharding import make_mesh
    from funasr_tpu.train_utils.trainer import Trainer

    model, frontend, tok = _build(tmp_path)
    ds = AudioDataset(index_ds="IndexDSJsonl",
                      index_ds_conf={"path": str(data_dir / "train.jsonl")},
                      tokenizer=tok)

    class CountingLoader:
        def __init__(self, base):
            self.base = base
            self.seen = []

        @property
        def sampler(self):
            return self.base.sampler

        def __iter__(self):
            for i, b in enumerate(self.base):
                self.seen.append(i)
                yield b

    base = DataLoader(ds, BatchSampler(ds, batch_size=4, shuffle=False))
    out = str(tmp_path / "exp_resume")
    mesh = make_mesh(1, model=1)
    # 12 utts / batch 4 = 3 batches per epoch; checkpoint every 2 steps ->
    # a mid-epoch ckpt at step 2 (epoch 0, epoch_step 2)
    tr1 = Trainer(model, optax.adam(1e-3), frontend=frontend, output_dir=out,
                  max_epoch=1, log_interval=1, save_checkpoint_interval=2,
                  mesh=mesh, resume=False)
    params = model.init_params(jax.random.PRNGKey(0))
    tr1.run(params, DataLoader(ds, BatchSampler(ds, batch_size=4, shuffle=False)))
    # rewrite 'latest' to the mid-epoch ckpt (end-of-epoch save overwrote it)
    mid = "model.pt.ep0.2"
    assert os.path.exists(os.path.join(out, mid))
    with open(os.path.join(out, "model.pt.latest"), "w") as f:
        f.write(mid)

    tr2 = Trainer(model, optax.adam(1e-3), frontend=frontend, output_dir=out,
                  max_epoch=1, log_interval=1, save_checkpoint_interval=0,
                  mesh=mesh, resume=True)
    p2 = model.init_params(jax.random.PRNGKey(1))
    loader2 = CountingLoader(base)
    tr2.run(p2, loader2)
    assert tr2.start_epoch == 0, "mid-epoch resume must re-enter the same epoch"
    # batches 0 and 1 were consumed pre-checkpoint; only batch index 2 may train.
    # CountingLoader.seen records yielded indices; the trainer must skip 0,1
    # without stepping on them: total optimizer steps = 2 (pre) + 1 (post)
    assert tr2.step == 3, f"expected 3 total steps after resume, got {tr2.step}"


def test_prune_keeps_latest(tmp_path):
    """_prune_nbest never deletes the checkpoint model.pt.latest points at."""
    import optax
    from funasr_tpu.parallel.sharding import make_mesh
    from funasr_tpu.train_utils.trainer import Trainer

    model, frontend, tok = _build(tmp_path)
    out = str(tmp_path / "exp_prune")
    tr = Trainer(model, optax.adam(1e-3), output_dir=out, max_epoch=1,
                 keep_nbest_models=1, avg_keep_nbest_models_type="loss",
                 mesh=make_mesh(1, model=1), resume=False)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = tr.tx.init(params)
    tr.save_checkpoint(params, opt_state, 0, metric=1.0)   # best
    tr.save_checkpoint(params, opt_state, 1, metric=2.0)   # worse, but latest
    assert os.path.exists(os.path.join(out, "model.pt.ep1")), \
        "latest checkpoint must survive n-best pruning"
    assert os.path.exists(os.path.join(out, "model.pt.ep0"))
