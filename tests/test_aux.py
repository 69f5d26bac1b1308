"""Auxiliary subsystems: profiling, checkpointing, config."""

import os
import tempfile
import time

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vrt.core.config import Config, FitConfig
from vrt.diff.checkpoint import load_checkpoint, save_checkpoint
from vrt.utils.profiling import FrameStats, Profiler


class TestProfiler:
    def test_phases_nest_and_accumulate(self):
        p = Profiler(annotate_device=False)
        with p.phase("frame"):
            with p.phase("march"):
                time.sleep(0.01)
            with p.phase("shade"):
                time.sleep(0.005)
        with p.phase("frame"):
            pass
        assert p.counts["frame"] == 2
        assert p.counts["frame/march"] == 1
        assert p.totals["frame/march"] >= 0.01
        assert "frame/shade" in p.report()

    def test_rays_per_second(self):
        p = Profiler(annotate_device=False)
        with p.phase("render"):
            time.sleep(0.01)
        rps = p.rays_per_second("render", 10000)
        assert 1e4 < rps < 1e7

    def test_frame_stats(self):
        fs = FrameStats()
        for _ in range(3):
            fs.tick()
        assert fs.fps == 0.0  # window not elapsed yet
        fs._window_start -= 2.0
        fs.tick()
        assert fs.fps > 0


class TestCheckpoint:
    def test_roundtrip(self):
        params = {"sdf": jnp.arange(12.0).reshape(3, 4),
                  "colors": jnp.ones((2, 2))}
        opt = optax.adam(1e-2)
        state = opt.init(params)
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "ckpt.npz")
            save_checkpoint(path, params, state, step=17,
                            extra={"note": "hi"})
            p2, s2, step, extra = load_checkpoint(path, params, state)
        assert step == 17
        assert extra["note"] == "hi"
        np.testing.assert_array_equal(np.asarray(p2["sdf"]),
                                      np.asarray(params["sdf"]))
        # optimizer state leaves restored too
        l1 = [np.asarray(x) for x in
              __import__("jax").tree.leaves(state)]
        l2 = [np.asarray(x) for x in
              __import__("jax").tree.leaves(s2)]
        assert all(np.array_equal(a, b) for a, b in zip(l1, l2))

    def test_structure_mismatch_raises(self):
        params = {"a": jnp.zeros(3)}
        opt = optax.sgd(1e-2)
        state = opt.init(params)
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "c.npz")
            save_checkpoint(path, params, state, 0)
            with pytest.raises(AssertionError):
                load_checkpoint(path, {"a": jnp.zeros(3),
                                       "b": jnp.zeros(2)}, state)


class TestConfig:
    def test_json_roundtrip(self):
        c = Config()
        c.render.width = 1920
        c.fit = FitConfig(steps=42, learning_rate=0.5)
        c.dist.model_parallel = 4
        text = c.to_json()
        c2 = Config.from_json(text)
        assert c2.render.width == 1920
        assert c2.fit.steps == 42
        assert c2.dist.model_parallel == 4

    def test_unknown_key_rejected(self):
        with pytest.raises(ValueError):
            Config.from_json('{"render": {"nope": 1}}')

    def test_file_io(self):
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "cfg.json")
            Config().save(path)
            c = Config.load(path)
        assert c.render.width == 512
