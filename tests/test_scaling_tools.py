"""Tests for the perf-accounting tools (tools/mfu.py roofline math,
tools/scaling_analysis.py HLO parsing + compiler-verified weak scaling).

The scaling claims in docs/PERFORMANCE.md rest on these two tools; the
weak-scaling test re-derives the headline fact (per-device FLOPs flat as
the mesh grows with fixed per-device batch) on the 8-virtual-device CPU
harness so a regression in the parallel path (replicate/shard_batch or
GSPMD-visible sharding) breaks loudly here.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from scaling_analysis import allreduce_bytes, analyze  # noqa: E402
from mfu import roofline_fields, V5E_BALANCE  # noqa: E402


class TestAllreduceBytes:
    def test_scalar_tuple_and_start_forms(self):
        hlo = """
          %ar0 = f32[128,256] all-reduce(%x), to_apply=%add
          %ar1 = (f32[1024], bf16[64,3]{1,0}) all-reduce(%y, %z), to_apply=%add
          %ar2 = bf16[512] all-reduce-start(%w), to_apply=%add
          %not_ar = f32[4,4] add(%a, %b)
        """
        want = 128 * 256 * 4 + 1024 * 4 + 64 * 3 * 2 + 512 * 2
        assert allreduce_bytes(hlo) == want

    def test_no_collectives(self):
        assert allreduce_bytes("%x = f32[8] add(%a, %b)") == 0

    def test_scalar_shape(self):
        # f32[] scalars (loss psums) count 4 bytes.
        assert allreduce_bytes("%s = f32[] all-reduce(%l), to_apply=%a") == 4


class TestRooflineFields:
    def test_hbm_bound_model(self):
        # intensity 100 < balance 240 -> hbm-bound; run at exactly half the
        # bandwidth roofline.
        flops, bts = 100e9, 1e9
        dt = bts / (819e9 / 2)
        out = roofline_fields(flops, bts, dt)
        assert out["bound_by"] == "hbm"
        assert out["pct_hbm_roofline"] == pytest.approx(0.5, abs=1e-3)
        assert out["pct_of_roofline_bound"] == pytest.approx(0.5, abs=1e-3)
        assert out["operational_intensity_flop_per_byte"] == 100.0

    def test_mxu_bound_model(self):
        flops = 1e12
        bts = flops / (2 * V5E_BALANCE)  # intensity = 2x balance
        dt = flops / 197e12  # exactly at the FLOPs peak
        out = roofline_fields(flops, bts, dt)
        assert out["bound_by"] == "mxu"
        assert out["mfu"] == pytest.approx(1.0, abs=1e-3)
        assert out["pct_of_roofline_bound"] == pytest.approx(1.0, abs=1e-3)


class TestWeakScaling:
    """Compiler-verified weak scaling on a tiny config (fast CPU compiles)."""

    @pytest.fixture(scope="class")
    def rows(self):
        return [analyze(n, res=8, per_device_batch=4, max_channels=16)
                for n in (1, 2)]

    def test_per_device_flops_flat(self, rows):
        r1, r2 = rows
        assert r2["global_batch"] == 2 * r1["global_batch"]
        # GSPMD partitions the doubled global batch: per-device work flat
        # (small tolerance for per-shard padding/bookkeeping).
        ratio = (r2["per_device_flops_per_round_g"]
                 / r1["per_device_flops_per_round_g"])
        assert ratio == pytest.approx(1.0, rel=0.05)

    def test_gradient_allreduce_present_and_mesh_independent(self, rows):
        r1, r2 = rows
        assert r1["allreduce_bytes_per_round_mb"] == pytest.approx(0, abs=0.01)
        # Mesh>1 must all-reduce gradients; traffic should be on the order
        # of the parameter bytes (a round updates G once and D twice, and
        # XLA may keep some reductions in other collective forms).
        assert r2["allreduce_bytes_per_round_mb"] > 0.1 * r2["param_bytes_mb"]
