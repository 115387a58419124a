"""Multi-process worker for the true multi-host test (VERDICT r2 #5).

Launched by tests/test_multiprocess.py as N separate processes, each with 4
virtual CPU devices, coordinated through `jax.distributed.initialize` with
gloo CPU collectives.  Exercises the framework's real `process_count > 1`
branches — `shard_coupling`'s `make_array_from_process_local_data` path,
`sync_hosts`, and `gather_multihost` — then writes its results as JSON for
the parent to compare against the single-process 8-device run.
"""

import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
out_path = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from multimodal_flows_tpu.config import Config
from multimodal_flows_tpu.data.state import DataCoupling, MultiModal
from multimodal_flows_tpu.parallel.mesh import (
    make_mesh,
    replicated_sharding,
    shard_coupling,
    sync_hosts,
)
from multimodal_flows_tpu.sampling.generator import (
    gather_multihost,
    generate,
    make_noise_source,
)
from multimodal_flows_tpu.train.systems import MMF
from tests.mp_common import GLOBAL_BATCH, make_global_coupling, tiny_mp_config


def main():
    assert jax.process_count() == nproc and len(jax.devices()) == 4 * nproc
    cfg = tiny_mp_config()
    system = MMF(cfg)
    mesh = make_mesh()

    # ---- one sharded train-loss step on the global batch --------------
    # every process builds the same global batch (shared seed) and
    # shard_coupling keeps its local rows via
    # make_array_from_process_local_data (mesh.py:66-86)
    coupling = make_global_coupling()
    batch = shard_coupling(coupling, mesh)

    params = system.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, replicated_sharding(mesh))
    loss, metrics = jax.jit(
        lambda p, b: system.loss_fn(p, b, jax.random.PRNGKey(42), train=False)
    )(params, batch)
    loss = float(loss)

    # one full train step (grad + update) over the same sharded batch:
    # the partitioner inserts the gradient all-reduce across processes
    import optax

    tx = optax.adam(1e-3)
    opt_state = jax.device_put(tx.init(jax.device_get(params)),
                               replicated_sharding(mesh))

    @jax.jit
    def train_step(p, o, b):
        (l, _), g = jax.value_and_grad(
            lambda q: system.loss_fn(q, b, jax.random.PRNGKey(42), train=False),
            has_aux=True)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    new_params, _, l2 = train_step(params, opt_state, batch)
    grad_fingerprint = float(
        jax.jit(lambda a, b: sum((jax.numpy.abs(x - y)).sum()
                                 for x, y in zip(jax.tree.leaves(a),
                                                 jax.tree.leaves(b))),
                out_shardings=replicated_sharding(mesh))(new_params, params))

    sync_hosts("after-train-step")

    # ---- per-process generation + multihost gather --------------------
    # the reference predicts per rank and gathers (callbacks.py:27-62);
    # here: each process samples its slice of the masks, then
    # `gather_multihost` all-gathers the host samples
    n_total = 16
    masks = np.ones((n_total, cfg.max_num_particles, 1), np.int64)
    lo = pid * (n_total // nproc)
    hi = lo + n_total // nproc
    res = generate(system, jax.device_get(params), masks[lo:hi],
                   num_timesteps=4, batch_size=8, seed=123 + pid)
    gathered = gather_multihost(res.sample)

    out = {
        "process": pid,
        "loss": loss,
        "loss_after_grad": float(l2),
        "param_delta_l1": grad_fingerprint,
        "gathered_jets": int(len(gathered)),
        "gathered_checksum": float(np.abs(np.asarray(gathered.continuous)).sum()),
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    print("worker", pid, "ok", flush=True)


if __name__ == "__main__":
    main()
