"""Multi-host (2-process CPU cluster) training-step parity.

Spawns two OS processes that form a jax.distributed cluster (gloo CPU
collectives), each contributing 2 virtual CPU devices to one global
4-device mesh. Each process loads only ITS contiguous slice of the
global batch (the per-rank DataLoader contract, train_bd.py:84-114) and
the sharded training step's loss must equal a single-process run on the
same global batch (VERDICT r2 item 3)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join({repo!r}, ".cache", "jax_compile_cpuvirt"))

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]

from implicit_depth_tpu.parallel import distributed as dist
dist.initialize(f"127.0.0.1:{{port}}", num_processes=2, process_id=pid,
                shutdown_timeout_seconds=900)
assert jax.process_count() == 2
assert len(jax.devices()) == 4, jax.devices()

import jax.numpy as jnp
from implicit_depth_tpu.parallel import mesh as mesh_lib
from implicit_depth_tpu.train import state as state_lib
from implicit_depth_tpu.models.bd_net import BDNet
from tests.test_train import _batch, D_BINS, K

mesh = mesh_lib.make_mesh(data=4, model=1)
cur, src = _batch(batch_size=4)  # the full global batch, host-side

net = BDNet(num_src_views=K, num_depth_bins=D_BINS, train_bn=True,
            image_encoder_name="tiny")
variables = net.init({{"params": jax.random.PRNGKey(0),
                      "aug": jax.random.PRNGKey(1)}}, cur, src)
tx = state_lib.make_optimizer()
state = state_lib.create_train_state(variables, tx)
state = mesh_lib.replicate(mesh, state)  # commit-first: no cross-host
# assert_equal collective while the other rank may still be compiling

# per-process slice of the global batch (rows [pid*2, pid*2+2))
lo, hi = pid * 2, pid * 2 + 2
local = jax.tree.map(lambda x: x[lo:hi], (cur, src))
gbatch = dist.global_batch(mesh, local)

step = jax.jit(state_lib.make_bd_train_step(net, train_flip=False))
# AOT-compile, then rendezvous through the coordination service BEFORE
# the first execution: on a 1-core host the two children compile
# serially, and the fast rank would otherwise sit in the step's gloo
# collective past its op timeout while the slow rank is still compiling.
compiled = step.lower(state, gbatch, jax.random.PRNGKey(0)).compile()
dist.barrier("compiled")
new_state, losses = compiled(state, gbatch, jax.random.PRNGKey(0))
loss = float(losses["loss"])
if pid == 0:
    with open(out_path, "w") as f:
        f.write(repr(loss))
print(f"process {{pid}}: loss={{loss}}")
dist.barrier("done")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.filterwarnings("ignore")
def test_two_process_training_step_matches_single_process(tmp_path):
    out_path = str(tmp_path / "loss.txt")
    child = _CHILD.format(repo=REPO)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    # one retry for CLUSTER-FORMATION flakes only (gloo/coordination
    # timing on a loaded 1-core host); the loss-parity assertion below is
    # never retried away — a numeric mismatch fails both attempts
    for attempt in (0, 1):
        port = _free_port()
        procs = [
            subprocess.Popen([sys.executable, "-c", child, str(pid), str(port), out_path],
                             env=env, cwd=REPO,
                             stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
            for pid in (0, 1)
        ]
        outs = [p.communicate(timeout=1200)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
        if attempt == 1:
            for p, out in zip(procs, outs):
                assert p.returncode == 0, f"child failed twice:\n{out[-3000:]}"
    with open(out_path) as f:
        loss_multi = float(f.read())

    # single-process reference on the same global batch
    import jax

    from implicit_depth_tpu.models.bd_net import BDNet
    from implicit_depth_tpu.train import state as state_lib
    from tests.test_train import _batch, D_BINS, K

    cur, src = _batch(batch_size=4)
    net = BDNet(num_src_views=K, num_depth_bins=D_BINS, train_bn=True,
                image_encoder_name="tiny")
    variables = net.init({"params": jax.random.PRNGKey(0),
                          "aug": jax.random.PRNGKey(1)}, cur, src)
    tx = state_lib.make_optimizer()
    state = state_lib.create_train_state(variables, tx)
    step = jax.jit(state_lib.make_bd_train_step(net, train_flip=False))
    _, losses = step(state, (cur, src), jax.random.PRNGKey(0))
    loss_single = float(losses["loss"])

    np.testing.assert_allclose(loss_multi, loss_single, rtol=1e-5)


_BARRIER_CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
from implicit_depth_tpu.parallel import distributed as dist
dist.initialize(f"127.0.0.1:{{port}}", num_processes=2, process_id=pid,
                shutdown_timeout_seconds=300)
if pid == 0:
    time.sleep(5)  # deliberate skew: barrier must tolerate it
dist.barrier("skewed", timeout_s=120)
with open(f"{{out}}.rank{{pid}}", "w") as f:
    f.write("ok")
dist.barrier("done", timeout_s=120)
"""


def test_two_process_barrier_tolerates_skew(tmp_path):
    """dist.barrier rendezvous through the coordination service: ranks
    arriving seconds apart (the multi-host eval merge pattern) must not
    time out and must all pass the barrier."""
    port = _free_port()
    out = str(tmp_path / "b")
    child = _BARRIER_CHILD.format(repo=REPO)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen([sys.executable, "-c", child, str(pid), str(port), out],
                         env=env, cwd=REPO,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{o[-2000:]}"
    assert os.path.exists(out + ".rank0") and os.path.exists(out + ".rank1")


def test_loader_sharding_partitions_each_batch():
    """Two shard-views of one loader cover each global batch exactly."""
    from implicit_depth_tpu.data.loader import BatchLoader
    from implicit_depth_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(num_frames=10, num_views=3, split="train")
    kw = dict(batch_size=4, num_workers=1, seed=3, epochs=1)
    full = BatchLoader(ds, **kw)
    s0 = BatchLoader(ds, shard_id=0, num_shards=2, **kw)
    s1 = BatchLoader(ds, shard_id=1, num_shards=2, **kw)
    idx_full = list(full._index_stream())
    idx_0 = list(s0._index_stream())
    idx_1 = list(s1._index_stream())
    assert len(idx_full) == len(idx_0) == len(idx_1)
    for f, a, b in zip(idx_full, idx_0, idx_1):
        assert len(a) == len(b) == 2
        np.testing.assert_array_equal(np.concatenate([a, b]), f)
