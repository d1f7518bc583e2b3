"""Distribution layer: tile-vs-whole-frame equivalence and stream sharding
on the virtual 8-device CPU mesh (SURVEY.md §4 item 3)."""

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P
import pytest

from rectdetect_tpu.dist import mesh as dmesh
from rectdetect_tpu.dist import tile as dtile
from rectdetect_tpu.ops.ccl import label_components
from rectdetect_tpu.pipeline.frontend import edge_frontend
from tests.conftest import synth_scene

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_tiled_frontend_matches_single_chip():
    bgr = synth_scene(h=48, w=64 * 4)
    ref_thin = np.asarray(edge_frontend(jnp.asarray(bgr)).edge_thin)

    m = dmesh.make_mesh(1, 4)

    @functools.partial(shard_map, mesh=m, in_specs=P(None, "tile", None),
                       out_specs=P(None, "tile"), check_vma=False)
    def run(tile_frame):
        et, _ = dtile.edge_frontend_tiled(tile_frame, halo=16)
        return et

    got = np.asarray(jax.jit(run)(jnp.asarray(bgr)))
    # XLA reassociates f32 adds differently for different tile widths, so
    # a handful of pixels sit on the other side of the NMS strict
    # comparisons (thinthres keeps/discards).  Require agreement
    # everywhere else and <0.2% flipped pixels.
    diff = np.abs(got - ref_thin)
    flipped = diff > 1e-3
    assert flipped.mean() < 0.002, flipped.mean()
    np.testing.assert_allclose(np.where(flipped, 0, got),
                               np.where(flipped, 0, ref_thin),
                               atol=1e-3)


def test_tiled_ccl_matches_single_chip():
    r = np.random.default_rng(2)
    h, wl, nt = 40, 32, 4
    pix = (r.random((h, wl * nt)) < 0.45).astype(np.int32)
    # add a long snake spanning all tiles
    pix[5, :] = 1
    pix[20, 10:120] = 1
    ref = np.asarray(label_components(jnp.asarray(pix), 0, 14, 6))

    m = dmesh.make_mesh(1, nt)

    @functools.partial(shard_map, mesh=m, in_specs=P(None, "tile"),
                       out_specs=P(None, "tile"), check_vma=False)
    def run(tile):
        return dtile.ccl_tiled(tile, 0)

    got = np.asarray(jax.jit(run)(jnp.asarray(pix)))
    np.testing.assert_array_equal(got, ref)


def test_stream_sharded_rect_consistent():
    from rectdetect_tpu.dist.stream import rect_frames_sharded
    from rectdetect_tpu.pipeline.rect import rect_frame
    tan = math.tan(math.radians(72) / 2)
    frames = np.stack([synth_scene(h=48, w=64, seed=s) for s in range(8)])
    m = dmesh.make_mesh(8, 1)
    res = rect_frames_sharded(jnp.asarray(frames), tan, m)
    # spot-check one frame against the single-chip pipeline
    single = rect_frame(jnp.asarray(frames[3]), tan)
    np.testing.assert_allclose(np.asarray(res.value[3]),
                               np.asarray(single.value), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(res.valid[3]),
                                  np.asarray(single.valid))


def test_rect_step_tiled_matches_single_chip():
    from rectdetect_tpu.config import PipelineConfig
    from rectdetect_tpu.pipeline.rect import rect_frame
    cfg = PipelineConfig(ls_capacity=512, max_groups=16, max_group_segs=16,
                         number_doublings=10)
    tan = math.tan(math.radians(72) / 2)
    bgr = synth_scene(h=40, w=32 * 4, seed=5)
    ref = rect_frame(jnp.asarray(bgr), tan, cfg)

    from rectdetect_tpu.dist import tile as dtile
    m = dmesh.make_mesh(1, 4)

    @functools.partial(shard_map, mesh=m,
                       in_specs=P(None, "tile", None), out_specs=P(),
                       check_vma=False)
    def run(tile_frame):
        return dtile.rect_step_tiled(tile_frame, tan, halo=12, cfg=cfg)

    got = jax.jit(run)(jnp.asarray(bgr))
    # tile-seam f32 reassociation can flip borderline NMS pixels, which can
    # perturb borderline hypotheses; accepted detections must agree on
    # geometry for matching groups
    rv = np.asarray(ref.valid)
    gv = np.asarray(got.valid)
    agree = rv == gv
    assert agree.mean() > 0.97
    both = rv & gv
    np.testing.assert_allclose(np.asarray(got.c2)[both],
                               np.asarray(ref.c2)[both], atol=2.0)


def test_stream_supervisor_failover():
    """StreamSupervisor quarantines a dying device, drops its in-flight
    frames, and re-places its streams on survivors (SURVEY.md §5
    failure-detection row)."""
    from rectdetect_tpu.dist.stream import StreamSupervisor

    devices = jax.devices()[:4]
    dead = set()

    def run_fn(bgr, device):
        if device in (devices[i] for i in dead):
            raise RuntimeError("injected device loss")
        return jax.device_put(jnp.asarray(bgr).sum(), device)

    def read_fn(res):
        return float(res)

    sup = StreamSupervisor(devices=devices, run_fn=run_fn, read_fn=read_fn)
    frames = [np.full((4, 4), i, np.uint8) for i in range(8)]

    # 8 streams spread over 4 devices, 2 each
    for sid in range(8):
        assert sup.submit(sid, frames[sid])
    loads = {}
    for sid, di in sup._assign.items():
        loads[di] = loads.get(di, 0) + 1
    assert loads == {0: 2, 1: 2, 2: 2, 3: 2}
    victims = [sid for sid, di in sup._assign.items() if di == 2]

    # kill device 2 mid-service: its next submit quarantines and retries
    dead.add(2)
    sup.collect(victims[0])                          # drain frame slot
    assert sup.submit(victims[0], frames[0])         # retried elsewhere
    assert sup.failures and sup.failures[0][0] == 2
    assert devices[2] not in sup.healthy_devices
    # in-flight frames of the dead device are dropped
    assert sup.collect(victims[1]) is None
    # both victims keep being served on survivors
    assert sup.submit(victims[1], frames[1])
    assert sup.collect(victims[1]) == float(np.asarray(frames[1]).sum())
    for sid in range(8):
        if sid not in victims:
            assert sup.collect(sid) == float(np.asarray(frames[sid]).sum())
    assert all(di != 2 for di in sup._assign.values())


def test_stream_supervisor_backpressure_and_exhaustion():
    from rectdetect_tpu.dist.stream import StreamSupervisor

    devices = jax.devices()[:2]

    def run_fn(bgr, device):
        raise RuntimeError("all devices broken")

    sup = StreamSupervisor(devices=devices, run_fn=run_fn,
                           read_fn=lambda r: r)
    assert not sup.submit("s", np.zeros((2, 2), np.uint8))
    with pytest.raises(RuntimeError, match="no healthy devices"):
        sup.submit("s", np.zeros((2, 2), np.uint8))

    ok = StreamSupervisor(devices=jax.devices()[:1],
                          run_fn=lambda b, d: b, read_fn=lambda r: r,
                          max_in_flight=1)
    assert ok.submit("s", 1)
    assert not ok.submit("s", 2)      # back-pressure: queue full
    assert ok.collect("s") == 1


def test_stream_supervisor_readback_failure():
    """A device lost between dispatch and readback is quarantined at
    collect(); the stream keeps being served elsewhere."""
    from rectdetect_tpu.dist.stream import StreamSupervisor

    devices = jax.devices()[:2]
    dead = set()

    def run_fn(bgr, device):
        if device in (devices[i] for i in dead):
            raise RuntimeError("dead at dispatch")
        return (device, bgr)

    def read_fn(res):
        device, bgr = res
        if device in (devices[i] for i in dead):
            raise RuntimeError("dead at readback")
        return bgr

    sup = StreamSupervisor(devices=devices, run_fn=run_fn, read_fn=read_fn)
    assert sup.submit("a", 11)
    di = sup._assign["a"]
    dead.add(di)
    assert sup.collect("a") is None           # quarantined at readback
    assert sup.failures and sup.failures[0][0] == di
    assert sup.submit("a", 12)                # re-placed on the survivor
    assert sup._assign["a"] != di
    assert sup.collect("a") == 12
