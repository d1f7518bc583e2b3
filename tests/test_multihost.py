"""Multi-host path: 2-process loopback jax.distributed simulation
(tools/multihost_sim.py promoted into the suite — VERDICT r2 item 8)
plus unit coverage of the host->stream-slot mapping.
"""

import os
import re
import subprocess
import sys

def test_local_stream_slots_mapping(monkeypatch):
    """local_stream_slots returns this host's contiguous [lo, hi) rows of
    the global stream axis (device order = stream slot order)."""
    from rectdetect_tpu.dist import multihost

    class D:
        def __init__(self, i):
            self.id = i

    devs = [D(i) for i in range(8)]
    # host owns devices 4..7 -> slots [4, 8)
    monkeypatch.setattr(multihost.jax, "devices", lambda: devs)
    monkeypatch.setattr(multihost.jax, "local_devices",
                        lambda: devs[4:8])
    assert multihost.local_stream_slots() == (4, 8)
    # single host owns everything
    monkeypatch.setattr(multihost.jax, "local_devices", lambda: devs)
    assert multihost.local_stream_slots() == (0, 8)
    # non-contiguous ids still map by enumeration order
    devs2 = [D(i) for i in (10, 3, 7, 42)]
    monkeypatch.setattr(multihost.jax, "devices", lambda: devs2)
    monkeypatch.setattr(multihost.jax, "local_devices",
                        lambda: [devs2[2], devs2[3]])
    assert multihost.local_stream_slots() == (2, 4)


def test_two_process_loopback_sim():
    """The 2-host loopback sim must run the stream-sharded AND the
    (stream, tile) shard_map paths end to end over jax.distributed and
    agree with the single-process pipeline."""
    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # workers set their own device count
    # generous timeout: the sim compiles the pipeline in two worker
    # processes, and suite runs share the host with 4 xdist workers
    # (plus whatever else the machine is doing) — 850 s flaked under
    # load twice in round-3/4 full-suite runs while passing easily in
    # isolation
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "multihost_sim.py"),
         "2", "2", "72x96"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=2000)
    sys.stdout.write(out.stdout[-2000:])
    sys.stderr.write(out.stderr[-2000:])
    assert out.returncode == 0
    # both hosts must report the tiled-step agreement line
    agrees = re.findall(r"valid-mask agreement vs single-process ([\d.]+)",
                        out.stdout)
    assert len(agrees) == 2
    assert all(float(a) >= 0.9 for a in agrees)
