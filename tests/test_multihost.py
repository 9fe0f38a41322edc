"""Multi-host (multi-process) smoke test over the JAX distributed runtime.

Launches two local processes that call jax.distributed.initialize against a
localhost coordinator (CPU backend, 2 virtual devices each), build a global
2x2 ('hosts','devices') mesh, and run a shard_map psum plus a distributed
top-k merge across the process boundary — the exact communication pattern
engine/sharded.py uses over 'cols' (reference has no multi-host story at
all; SURVEY §2.5 DCN row). Skipped when the distributed runtime is
unavailable in this build.

The scaling-efficiency benchmark protocol lives in docs/distributed.md.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=coord, num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()  # 2 per process

import numpy as np
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()).reshape(2, 2), ("hosts", "devices"))

# 1) cross-host psum: each shard contributes hosts_index + 1; the global
#    sum (1+1) + (2+2) = 6 requires reduction across the process boundary
def f():
    h = jax.lax.axis_index("hosts").astype(jnp.float32)
    d = jax.lax.axis_index("devices").astype(jnp.float32)
    # 0*d makes the value formally vary over both mesh axes (shard_map's
    # varying-axis typing requires it for a two-axis psum)
    return jax.lax.psum(h + 1.0 + 0.0 * d, ("hosts", "devices"))

g = shard_map(f, mesh=mesh, in_specs=(), out_specs=P())
got = jax.jit(g)()
lv = float(np.asarray(got.addressable_data(0)))
assert lv == 6.0, lv

# 2) distributed per-row top-k merge over the column axis (the sharded
#    engine's merge pattern: per-shard top-k -> all_gather -> re-top-k),
#    with shard contents derived from axis indices so both processes can
#    verify against the same analytic global matrix
k, RS, CS = 3, 4, 8  # per-shard rows/cols; global (8, 16)

def shard_scores(hi, di):
    rows = jnp.arange(RS, dtype=jnp.float32)[:, None] + hi * RS
    cols = jnp.arange(CS, dtype=jnp.float32)[None, :] + di * CS
    return jnp.sin(rows * 17.0 + cols)

def topk_merge():
    hi = jax.lax.axis_index("hosts")
    di = jax.lax.axis_index("devices")
    scores = shard_scores(hi, di)
    v, i = jax.lax.top_k(scores, k)
    vs = jax.lax.all_gather(v, "devices", axis=1, tiled=True)
    is_ = jax.lax.all_gather(i + di * CS, "devices", axis=1, tiled=True)
    vv, pos = jax.lax.top_k(vs, k)
    return vv, jnp.take_along_axis(is_, pos, axis=1)

try:
    h = shard_map(
        topk_merge, mesh=mesh, in_specs=(),
        out_specs=(P("hosts", None), P("hosts", None)),
        check_vma=False,
    )
except TypeError:  # older jax spelling
    h = shard_map(
        topk_merge, mesh=mesh, in_specs=(),
        out_specs=(P("hosts", None), P("hosts", None)),
        check_rep=False,
    )
vv, ii = jax.jit(h)()
vloc = np.asarray(vv.addressable_data(0))  # this host's row block
rows = np.arange(8.0)[:, None]
cols = np.arange(16.0)[None, :]
full = np.sin(np.float32(rows * 17.0 + cols).astype(np.float32))
want = -np.sort(-full, axis=1)[:, :k]
mine = want[pid * RS : (pid + 1) * RS]
assert np.allclose(vloc, mine, atol=1e-5), (vloc, mine)
print(f"proc {pid} OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_smoke(tmp_path):
    try:
        import jax

        if not hasattr(jax, "distributed"):
            pytest.skip("jax.distributed unavailable")
    except ImportError:
        pytest.skip("jax unavailable")

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed runtime hung (unsupported in this build)")
    for p, out in zip(procs, outs):
        if p.returncode != 0 and (
            "UNIMPLEMENTED" in out or "not available" in out.lower()
        ):
            pytest.skip(f"distributed runtime unsupported: {out[-200:]}")
        assert p.returncode == 0, out
        assert "OK" in out
