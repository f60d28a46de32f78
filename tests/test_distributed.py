"""Real multi-process collective test: 2 JAX processes on CPU, one psum and
one sharded CDAE step across process boundaries (the multi-host capability
the reference never had, SURVEY §4)."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from cdae_tpu.parallel.distributed import initialize
assert initialize() is True
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from cdae_tpu.parallel.mesh import make_mesh

assert jax.process_count() == 2
assert len(jax.devices()) == 4  # 2 procs x 2 local cpu devices

mesh = make_mesh(n_data=2, n_model=2)
# a global array sharded over both axes; sum reduces across processes
x = jnp.ones((8, 8))
xs = jax.device_put(x, NamedSharding(mesh, P("data", "model")))
total = jax.jit(lambda a: jnp.sum(a))(xs)
np.testing.assert_allclose(float(total), 64.0)

# sharded CDAE train step across the 2-process mesh
from cdae_tpu.models.cdae import CDAE, CDAEConfig
from cdae_tpu.parallel.sharded import (
    make_batch, make_sharded_train_step, shard_cdae_state)
from cdae_tpu.data.dataset import Interactions
rng = np.random.default_rng(0)
pairs = np.unique(rng.integers(0, 32 * 64, 400))
data = Interactions.from_arrays((pairs // 64).astype(np.int32),
                                (pairs % 64).astype(np.int32),
                                num_users=32, num_items=64)
model = CDAE(CDAEConfig(num_dim=16, loss="SQUARE", batch_size=16,
                        use_pallas=False))
state = model.reset(data, seed=0)
params = shard_cdae_state(mesh, state.params)
step = make_sharded_train_step(model, mesh, params)
uids, items, mask, lengths, weight = make_batch(
    state.padded, np.arange(16), 16)
out = step(params, jnp.asarray(uids), jnp.asarray(items), jnp.asarray(mask),
           jnp.asarray(lengths), jnp.asarray(weight), jax.random.PRNGKey(0))
jax.block_until_ready(out)

# item-sharded TP pairwise epoch: iv/ib blocks live on DIFFERENT processes,
# so the psum row-gathers and contribution all-gathers cross the process
# boundary (parallel/tp_pairwise.ShardedMFTP)
from cdae_tpu.models.mf import BPR, MFConfig
from cdae_tpu.parallel.tp_pairwise import ShardedMFTP
tp = ShardedMFTP(BPR(MFConfig(num_dim=8, num_neg=2, batch_size=16,
                              dense_mode=False)), mesh=mesh)
tstate = tp.reset(data, seed=0)
tstate = tp.train_one_iteration(tstate, jax.random.PRNGKey(1))
jax.block_until_ready(tstate.params)
for s in tstate.params["iv"].addressable_shards:
    assert np.all(np.isfinite(np.asarray(s.data)))

print(f"proc {jax.process_index()} OK")
"""


@pytest.mark.slow
def test_two_process_collectives(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            CDAE_COORDINATOR=f"localhost:{port}",
            CDAE_NUM_PROCESSES="2",
            CDAE_PROCESS_ID=str(pid),
            PYTHONPATH=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            JAX_PLATFORMS="cpu",
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "OK" in out


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
