"""True multi-process execution (VERDICT r2 #5): 2 local processes x 4
virtual CPU devices, coordinated via `jax.distributed.initialize` with
gloo CPU collectives.

The `jax.process_count() > 1` branches (`parallel/mesh.py:66-86`,
`sampling/generator.py:gather_multihost`, `sync_hosts`) stop being dead
code: each worker shards the shared global batch with
`make_array_from_process_local_data`, runs a sharded loss + train step
(gradient all-reduce across processes), generates its slice of the jets,
and all-gathers the samples.  The parent asserts loss parity with the
single-process 8-device run on the identical batch.

Marked slow: two fresh JAX processes + gloo rendezvous take ~1 min.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_parity(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"w{i}.json") for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own 4-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             str(i), "2", str(port), outs[i]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out)
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{lg[-3000:]}"

    results = [json.load(open(o)) for o in outs]

    # both processes agree on the (psum-reduced, replicated) global loss
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"], rtol=1e-6)
    np.testing.assert_allclose(results[0]["loss_after_grad"],
                               results[1]["loss_after_grad"], rtol=1e-6)
    # the train step moved the (replicated) params identically on each host
    assert results[0]["param_delta_l1"] > 0
    np.testing.assert_allclose(results[0]["param_delta_l1"],
                               results[1]["param_delta_l1"], rtol=1e-5)
    # gather_multihost returned ALL jets to every process, identically
    assert results[0]["gathered_jets"] == results[1]["gathered_jets"] == 16
    np.testing.assert_allclose(results[0]["gathered_checksum"],
                               results[1]["gathered_checksum"], rtol=1e-6)

    # ---- single-process 8-device reference on the identical batch ------
    import jax

    from multimodal_flows_tpu.parallel.mesh import (
        make_mesh,
        replicated_sharding,
        shard_coupling,
    )
    from multimodal_flows_tpu.train.systems import MMF
    from tests.mp_common import make_global_coupling, tiny_mp_config

    assert jax.device_count() == 8  # conftest virtual mesh
    cfg = tiny_mp_config()
    system = MMF(cfg)
    mesh = make_mesh()
    batch = shard_coupling(make_global_coupling(), mesh)
    params = jax.device_put(system.init_params(jax.random.PRNGKey(0)),
                            replicated_sharding(mesh))
    loss_1proc, _ = jax.jit(
        lambda p, b: system.loss_fn(p, b, jax.random.PRNGKey(42), train=False)
    )(params, batch)

    np.testing.assert_allclose(results[0]["loss"], float(loss_1proc), rtol=1e-5)
