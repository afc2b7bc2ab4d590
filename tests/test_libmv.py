"""libmv problem loading + solving (real in-tree data)."""

import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.models import libmv

DATA = "/root/reference/data/libmv-ba-problems"


def test_load_problem_01():
    lp = libmv.load_libmv_file(f"{DATA}/problem_01.bin")
    assert lp.cameras_Rt.shape == (333, 6)
    assert lp.points.shape[1] == 3
    assert lp.markers.shape[0] == lp.marker_cam.shape[0]
    assert lp.intrinsics.shape == (8,)
    assert lp.is_image_space


def test_solve_problem_01_improves():
    lp = libmv.load_libmv_file(f"{DATA}/problem_01.bin")
    p, intr, cams, pts = libmv.build_problem(lp)
    opts = libmv.default_options()
    opts.max_num_iterations = 20
    s = ct.solve(opts, p)
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    assert s.final_cost <= s.initial_cost
    # intrinsics held constant by default
    np.testing.assert_allclose(
        p.parameter_block_value(intr), lp.intrinsics, rtol=1e-12
    )


def test_refine_intrinsics_moves_them():
    lp = libmv.load_libmv_file(f"{DATA}/problem_01.bin")
    p, intr, cams, pts = libmv.build_problem(lp, refine_intrinsics=True)
    opts = libmv.default_options()
    opts.max_num_iterations = 10
    s = ct.solve(opts, p)
    assert s.final_cost <= s.initial_cost
    assert not np.allclose(p.parameter_block_value(intr), lp.intrinsics)


def test_bad_file(tmp_path):
    bad = tmp_path / "x.bin"
    bad.write_bytes(b"Zjunk")
    with pytest.raises(ValueError):
        libmv.load_libmv_file(bad)
