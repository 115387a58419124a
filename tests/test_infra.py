"""Infra tests: checkpoint best-k slot logic, config round trip,
LR schedule semantics, loggers (reference parity: `scripts/train_mmf.py:128-148`,
`utils/helpers.py:14-48`, `model/MMF.py:77-110`)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_flows_tpu.config import Config
from multimodal_flows_tpu.train.checkpoints import CheckpointManager
from multimodal_flows_tpu.train.lr_schedules import warmup_cosine_epoch_schedule
from multimodal_flows_tpu.utils.logger import MetricsLogger


def test_checkpoint_best_slots(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    state1 = {"params": {"w": np.ones(3)}, "step": np.full((), 1, np.int32)}
    state2 = {"params": {"w": np.full(3, 2.0)}, "step": np.full((), 2, np.int32)}
    state3 = {"params": {"w": np.full(3, 3.0)}, "step": np.full((), 3, np.int32)}

    w = mgr.save(state1, {"val_loss": 1.0, "val_loss_mse": 0.5, "val_loss_ce": 0.5}, epoch=1)
    assert w["last"] and w["best"] and w["best_mse"] and w["best_ce"]

    # val_loss worse, mse better -> only best_mse (and last) update
    w = mgr.save(state2, {"val_loss": 2.0, "val_loss_mse": 0.4, "val_loss_ce": 0.9}, epoch=2)
    assert w["last"] and not w["best"] and w["best_mse"] and not w["best_ce"]

    w = mgr.save(state3, {"val_loss": 0.5, "val_loss_mse": 0.6, "val_loss_ce": 0.3}, epoch=3)
    assert w["best"] and not w["best_mse"] and w["best_ce"]

    # restore each slot and check contents
    template = {"params": {"w": np.zeros(3)}, "step": np.full((), 0, np.int32)}
    assert mgr.load(template, "best")["params"]["w"][0] == 3.0
    assert mgr.load(template, "best_mse")["params"]["w"][0] == 2.0
    assert mgr.load(template, "best_ce")["params"]["w"][0] == 3.0
    assert mgr.load(template, "last")["params"]["w"][0] == 3.0

    # index persisted and reloadable
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr2.index["best_values"]["best"]["value"] == 0.5
    assert len(mgr2.index["history"]) == 3

    with pytest.raises(FileNotFoundError):
        mgr.load(template, "nope")


def test_config_roundtrip(tmp_path):
    cfg = Config(dir=str(tmp_path), project="p", n_embd=32,
                 metadata={"mean": [1.0, 2.0, 3.0], "std": [1, 1, 1]},
                 tags=["system:MMF"])
    cfg.mint_experiment_id()
    cfg.save()
    loaded = Config.load(cfg.experiment_dir)
    assert loaded.n_embd == 32
    assert loaded.metadata["mean"] == [1.0, 2.0, 3.0]
    assert loaded.tags == ["system:MMF"]
    assert loaded.experiment_id == cfg.experiment_id


def test_lr_schedule_warmup_cosine():
    spe = 10
    sched = warmup_cosine_epoch_schedule(lr=1.0, lr_final=0.1, warmup_epochs=2,
                                         max_epochs=12, steps_per_epoch=spe)
    # warmup starts at 1% and ramps
    assert float(sched(0)) == pytest.approx(0.01)
    assert float(sched(1 * spe)) == pytest.approx(0.505, abs=1e-3)
    # after warmup: cosine from lr
    assert float(sched(2 * spe)) == pytest.approx(1.0)
    # midpoint of the 10 cosine epochs
    assert float(sched(7 * spe)) == pytest.approx(0.55, abs=1e-6)
    # end: lr_final
    assert float(sched(12 * spe)) == pytest.approx(0.1)
    # staircase: constant within an epoch
    assert float(sched(5 * spe)) == float(sched(5 * spe + spe - 1))


def test_metrics_logger(tmp_path):
    logger = MetricsLogger(str(tmp_path / "exp"))
    logger.log(1, {"loss": 1.5, "epoch": 0})
    logger.log(2, {"loss": jnp.asarray(0.5), "epoch": 1})
    logger.close()
    lines = open(tmp_path / "exp" / "metrics.jsonl").read().strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[1])["loss"] == 0.5
    csv = open(tmp_path / "exp" / "metrics.csv").read().strip().splitlines()
    assert csv[0].startswith("step,")
    assert len(csv) == 3


def test_unique_dir(tmp_path):
    from multimodal_flows_tpu.utils.logger import get_unique_dir, setup_logging_dir

    base = str(tmp_path / "run")
    assert get_unique_dir(base) == base
    os.makedirs(base)
    assert get_unique_dir(base) == base + "_1"
    os.makedirs(base + "_1")
    assert get_unique_dir(base) == base + "_2"
    assert get_unique_dir(base, exist_ok=True) == base

    out = setup_logging_dir(str(tmp_path / "exp"))
    assert os.path.isdir(out)


def test_process_batch_slice_partitions_globally():
    """Multi-host batch sharding: the per-process slices are equal-size,
    disjoint, and cover the global batch axis (VERDICT r1 weak #5: the
    slicing is a pure function exercised without multiple processes)."""
    import numpy as np
    import pytest

    from multimodal_flows_tpu.parallel.mesh import (
        local_batch_shard, process_batch_slice)

    n, n_proc = 24, 4
    slices = [process_batch_slice(n, n_proc, i) for i in range(n_proc)]
    rows = np.concatenate([np.arange(n)[s] for s in slices])
    assert rows.tolist() == list(range(n))           # cover, in order
    assert all(s.stop - s.start == n // n_proc for s in slices)

    # local_batch_shard slices the right axis of a stacked epoch
    stack = np.arange(2 * n * 3).reshape(2, n, 3)
    shards = [local_batch_shard(stack, axis=1, n_proc=n_proc, idx=i)
              for i in range(n_proc)]
    np.testing.assert_array_equal(np.concatenate(shards, axis=1), stack)

    # single process is the identity
    assert process_batch_slice(n, 1, 0) == slice(0, n)

    with pytest.raises(AssertionError):
        process_batch_slice(10, 4, 0)  # uneven shares are an error


def test_checkpoint_top_k(tmp_path):
    """save_top_k parity (reference keeps the 10 best per monitor,
    `scripts/train_mmf.py:128-148`): runners-up are kept as {slot}-ep{N}
    directories, the worst is evicted beyond k, and the plain slot always
    holds the #1 checkpoint."""
    mgr = CheckpointManager(str(tmp_path / "ck"), monitors={"best": "val_loss"},
                            top_k=3)

    def st(v):
        return {"w": np.full(2, float(v))}

    # epochs 1..5 with losses 5,3,4,1,2 -> top-3 = epochs 4(1.0), 5(2.0), 2(3.0)
    losses = {1: 5.0, 2: 3.0, 3: 4.0, 4: 1.0, 5: 2.0}
    for ep, v in losses.items():
        w = mgr.save(st(ep), {"val_loss": v}, epoch=ep)
        assert w["best_topk"] or v > min(list(losses.values())[:ep])

    ranked = mgr.index["topk"]["best"]
    assert [e["epoch"] for e in ranked] == [4, 5, 2]
    # kept dirs exist, evicted dirs are gone
    for e in ranked:
        assert mgr.has(e["name"])
    assert not mgr.has("best-ep1")
    assert not mgr.has("best-ep3")
    # plain slot = #1 (epoch 4)
    tpl = {"w": np.zeros(2)}
    assert mgr.load(tpl, "best")["w"][0] == 4.0
    # runner-up loadable by ranked name
    assert mgr.load(tpl, ranked[1]["name"])["w"][0] == 5.0
    # index survives reload
    mgr2 = CheckpointManager(str(tmp_path / "ck"), top_k=3)
    assert [e["epoch"] for e in mgr2.index["topk"]["best"]] == [4, 5, 2]


def _read_tfrecords(path):
    """Minimal TFRecord reader with masked-CRC verification."""
    import struct

    from multimodal_flows_tpu.utils.logger import _masked_crc

    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header), "header CRC mismatch"
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == _masked_crc(data), "data CRC mismatch"
            records.append(data)
    return records


def _parse_event_scalars(data):
    """Decode tag -> simple_value pairs from a hand-encoded Event proto."""
    import struct as _s

    def read_varint(buf, i):
        shift, val = 0, 0
        while True:
            b = buf[i]; i += 1
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val, i
            shift += 7

    scalars = {}
    step = None
    i = 0
    while i < len(data):
        key, i = read_varint(data, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, i = read_varint(data, i)
            if field == 2:
                step = val
        elif wire == 1:
            i += 8
        elif wire == 2:
            ln, i = read_varint(data, i)
            payload = data[i:i + ln]; i += ln
            if field == 5:  # summary
                j = 0
                while j < len(payload):
                    k2, j = read_varint(payload, j)
                    ln2, j = read_varint(payload, j)
                    value_msg = payload[j:j + ln2]; j += ln2
                    # Value: tag=1 (len-delim), simple_value=2 (32-bit)
                    m = 0
                    tag = None
                    while m < len(value_msg):
                        k3, m = read_varint(value_msg, m)
                        f3, w3 = k3 >> 3, k3 & 7
                        if w3 == 2:
                            l3, m = read_varint(value_msg, m)
                            if f3 == 1:
                                tag = value_msg[m:m + l3].decode()
                            m += l3
                        elif w3 == 5:
                            if f3 == 2 and tag:
                                scalars[tag] = _s.unpack("<f", value_msg[m:m + 4])[0]
                            m += 4
                        elif w3 == 0:
                            _, m = read_varint(value_msg, m)
        else:
            raise AssertionError(f"unexpected wire type {wire}")
    return step, scalars


def test_tensorboard_sink(tmp_path):
    """The dependency-free TensorBoard sink writes valid TFRecord framing
    (masked CRC32C) and decodable scalar Summary events."""
    import glob

    from multimodal_flows_tpu.utils.logger import TensorBoardSink

    sink = TensorBoardSink(str(tmp_path / "tb"))
    sink.log(7, {"train_loss": 1.5, "val_loss": 2.25, "note": "skipme"})
    sink.log(8, {"train_loss": 1.25})
    sink.close()

    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_tfrecords(files[0])
    assert len(records) == 3  # file_version + 2 scalar events

    step, scalars = _parse_event_scalars(records[1])
    assert step == 7
    assert scalars == {"train_loss": 1.5, "val_loss": 2.25}
    step, scalars = _parse_event_scalars(records[2])
    assert step == 8 and scalars == {"train_loss": 1.25}


def test_checkpoint_nan_metric_never_enters_ranking(tmp_path):
    """A diverged (NaN/inf) validation metric must not poison the top-k
    ranking: NaN comparisons are all False, so one poisoned entry would
    scramble the sort and freeze the best slot for the rest of the run."""
    mgr = CheckpointManager(str(tmp_path / "ck"), monitors={"best": "val_loss"},
                            top_k=3)

    def st(v):
        return {"w": np.full(2, float(v))}

    seq = {1: 1.0, 2: float("nan"), 3: 0.5, 4: float("inf"), 5: 0.1}
    for ep, v in seq.items():
        w = mgr.save(st(ep), {"val_loss": v}, epoch=ep)
        if not np.isfinite(v):
            assert not w["best"] and not w["best_topk"]

    ranked = mgr.index["topk"]["best"]
    assert [e["epoch"] for e in ranked] == [5, 3, 1]
    assert all(np.isfinite(e["value"]) for e in ranked)
    # best slot tracks the recovered post-divergence optimum
    tpl = {"w": np.zeros(2)}
    assert mgr.load(tpl, "best")["w"][0] == 5.0
    assert mgr.index["best_values"]["best"]["value"] == 0.1


def test_checkpoint_resume_duplicate_epochs_and_link_safety(tmp_path):
    """Advisor r2: resuming from a non-`last` slot re-runs epochs whose
    ranked names already exist.  The manager must replace (not append) the
    duplicate entry, and with top_k=1 the `best` symlink must never dangle
    — eviction skips the directory the link points at and the link is
    re-pointed before any rmtree."""
    import os

    mgr = CheckpointManager(str(tmp_path / "ck"), monitors={"best": "val_loss"},
                            top_k=1)

    def st(v):
        return {"w": np.full(2, float(v))}

    mgr.save(st(1), {"val_loss": 5.0}, epoch=1)
    mgr.save(st(2), {"val_loss": 3.0}, epoch=2)
    # resume re-runs epoch 2 with a slightly different value
    mgr.save(st(22), {"val_loss": 2.9}, epoch=2)

    ranked = mgr.index["topk"]["best"]
    names = [e["name"] for e in ranked]
    assert len(names) == len(set(names)) == 1  # replaced, not duplicated
    assert ranked[0]["value"] == 2.9

    link = os.path.join(mgr.dir, "best")
    assert os.path.islink(link)
    target = os.path.join(mgr.dir, os.readlink(link))
    assert os.path.isdir(target)  # never dangling
    tpl = {"w": np.zeros(2)}
    assert mgr.load(tpl, "best")["w"][0] == 22.0

    # a later non-improving epoch must not disturb the link
    mgr.save(st(3), {"val_loss": 9.0}, epoch=3)
    assert os.path.isdir(os.path.join(mgr.dir, os.readlink(link)))
    assert mgr.load(tpl, "best")["w"][0] == 22.0


def test_checkpoint_physics_margin_tie_to_later(tmp_path):
    """Round-5 tie-to-later rule for `best_physics`: the slot holds the
    LATEST eval within (1+margin) of the best score seen — argmin over
    ~30 noisy in-training evals provably picks a noise dip
    (PHYSEVAL_CRN_r05.md: equal-quality late checkpoints differ ~15% per
    seed at 2k jets).  A score beyond the margin freezes the slot at the
    last healthy epoch; a later healthy score re-takes it."""
    mgr = CheckpointManager(
        str(tmp_path / "ck"), monitors={"best_physics": "val_w1_physics"},
        top_k=3, physics_margin=0.3)

    def st(v):
        return {"w": np.full(2, float(v))}

    tpl = {"w": np.zeros(2)}

    # improving then statistically-tied sequence: the slot tracks LATEST
    w = mgr.save(st(1), {"val_w1_physics": 0.10}, epoch=1)
    assert w["best_physics"]
    w = mgr.save(st(2), {"val_w1_physics": 0.05}, epoch=2)   # new best
    assert w["best_physics"]
    w = mgr.save(st(3), {"val_w1_physics": 0.06}, epoch=3)   # within 30%
    assert w["best_physics"]
    assert mgr.load(tpl, "best_physics")["w"][0] == 3.0      # later tie wins
    assert mgr.index["best_values"]["best_physics"]["epoch"] == 3
    assert mgr.index["best_values"]["best_physics"]["min_value"] == 0.05

    # a genuinely-worse eval (beyond 1.3x of best) freezes the slot
    w = mgr.save(st(4), {"val_w1_physics": 0.09}, epoch=4)
    assert not w["best_physics"]
    assert mgr.load(tpl, "best_physics")["w"][0] == 3.0
    assert mgr.index["best_values"]["best_physics"]["frozen"]

    # recovery: a later healthy score re-takes the slot
    w = mgr.save(st(5), {"val_w1_physics": 0.055}, epoch=5)
    assert w["best_physics"]
    assert mgr.load(tpl, "best_physics")["w"][0] == 5.0
    assert not mgr.index["best_values"]["best_physics"]["frozen"]

    # min_value survives a resume (index round trip)
    mgr2 = CheckpointManager(
        str(tmp_path / "ck"), monitors={"best_physics": "val_w1_physics"},
        top_k=3, physics_margin=0.3)
    assert mgr2.index["best_values"]["best_physics"]["min_value"] == 0.05
    w = mgr2.save(st(6), {"val_w1_physics": 0.08}, epoch=6)  # > 1.3 * 0.05
    assert not w["best_physics"]

    # the ranked runner-up space still works independently of the slot
    ranked = mgr2.index["topk"]["best_physics"]
    assert ranked[0]["value"] == 0.05

    # margin=0 keeps the legacy argmin symlink behavior
    mgr0 = CheckpointManager(
        str(tmp_path / "ck0"), monitors={"best_physics": "val_w1_physics"},
        top_k=3, physics_margin=0.0)
    mgr0.save(st(1), {"val_w1_physics": 0.05}, epoch=1)
    mgr0.save(st(2), {"val_w1_physics": 0.06}, epoch=2)      # tie -> NOT taken
    assert mgr0.load(tpl, "best_physics")["w"][0] == 1.0
    assert os.path.islink(os.path.join(mgr0.dir, "best_physics"))


def test_wandb_sink_fake_module(tmp_path, monkeypatch):
    """WandbSink drives wandb.init/log/finish (W&B replaces the
    reference's Comet tracker, `utils/helpers.py:14-38`); MetricsLogger
    degrades gracefully when the package is absent."""
    import sys
    import types

    calls = {"log": [], "finished": False}

    class FakeRun:
        def log(self, metrics, step=None):
            calls["log"].append((step, metrics))

        def finish(self):
            calls["finished"] = True

    fake = types.ModuleType("wandb")

    def fake_init(**kw):
        calls["init"] = kw
        return FakeRun()

    fake.init = fake_init
    monkeypatch.setitem(sys.modules, "wandb", fake)

    logger = MetricsLogger(str(tmp_path / "exp"), wandb_project="proj",
                           wandb_name="run1", wandb_config={"lr": 1e-3})
    logger.log(3, {"loss": 1.25, "note": "skipped-non-scalar"})
    logger.close()
    assert calls["init"]["project"] == "proj"
    assert calls["init"]["name"] == "run1"
    assert calls["init"]["mode"] == "offline"  # zero-egress default
    assert calls["log"] == [(3, {"loss": 1.25})]
    assert calls["finished"]
    # JSONL sink still wrote alongside
    assert (tmp_path / "exp" / "metrics.jsonl").exists()

    # absent package: warn-and-continue with the offline sinks
    monkeypatch.delitem(sys.modules, "wandb")
    logger2 = MetricsLogger(str(tmp_path / "exp2"), wandb_project="proj")
    logger2.log(1, {"loss": 2.0})
    logger2.close()
    assert (tmp_path / "exp2" / "metrics.jsonl").exists()
