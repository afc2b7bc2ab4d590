"""Multi-device sharding tests.

Mirrors the reference's 1-vs-N-thread comparisons (SURVEY.md §4.7,
parallel_for_test.cc / *_threads_test variants): the same solve runs on
one device and sharded over the 8 virtual CPU devices, and costs/steps
must agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.evaluator import Evaluator
from ceres_tpu.models import bal
from ceres_tpu.parallel import make_mesh, pad_family, shard_program


@pytest.fixture(scope="module")
def bal_instance():
    # Odd observation count so padding is exercised.
    return bal.synthesize_bal(
        num_cameras=4, num_points=100, num_observations=397, seed=9
    )


class TestPadding:
    def test_pad_family_masks_rows(self, bal_instance):
        p, _, _ = bal.build_problem(bal_instance)
        program = p.program()
        fam = program.families[0]
        B = fam.batch
        padded = pad_family(fam, 8)
        assert padded.batch % 8 == 0
        assert padded.batch >= B
        m = np.asarray(padded.mask)
        assert m[:B].sum() == B and m[B:].sum() == 0

    def test_padded_evaluation_identical(self, bal_instance):
        p, _, _ = bal.build_problem(bal_instance)
        program = p.program()
        x = program.initial_ambient()
        ev = Evaluator(program)
        full = ev.cost_gradient_jacobian(x)

        p2, _, _ = bal.build_problem(bal_instance)
        program2 = p2.program()
        program2.families = [pad_family(f, 8) for f in program2.families]
        ev2 = Evaluator(program2)
        full2 = ev2.cost_gradient_jacobian(x)

        np.testing.assert_allclose(
            float(full.cost), float(full2.cost), rtol=1e-14
        )
        np.testing.assert_allclose(
            np.asarray(full.gradient), np.asarray(full2.gradient), rtol=1e-12
        )


class TestShardedSolve:
    @pytest.mark.parametrize(
        "solver",
        [
            "ITERATIVE_SCHUR",
            "DENSE_SCHUR",
            "CGNR",
            # DENSE_QR shards a dense (M, nt) factorization: ~2 min of
            # XLA:CPU partitioned-QR compile alone -> slow tier.
            pytest.param("DENSE_QR", marks=pytest.mark.slow),
        ],
    )
    def test_sharded_matches_single_device(self, bal_instance, solver):
        finals = []
        for mesh in (None, make_mesh(8)):
            p, _, _ = bal.build_problem(bal_instance)
            opts = ct.SolverOptions(
                linear_solver_type=getattr(ct.LinearSolverType, solver),
                preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI
                if "SCHUR" in solver
                else ct.PreconditionerType.JACOBI,
                max_num_iterations=10,
                mesh=mesh,
            )
            s = ct.solve(opts, p)
            finals.append(s.final_cost)
        np.testing.assert_allclose(finals[0], finals[1], rtol=1e-8)

    def test_sharded_with_robust_loss(self, bal_instance):
        finals = []
        for mesh in (None, make_mesh(8)):
            p, _, _ = bal.build_problem(
                bal_instance, loss=ct.loss.HuberLoss(1.0)
            )
            opts = ct.SolverOptions(
                linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
                preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
                max_num_iterations=8,
                mesh=mesh,
            )
            s = ct.solve(opts, p)
            finals.append(s.final_cost)
        np.testing.assert_allclose(finals[0], finals[1], rtol=1e-8)


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        fn, args = g.entry()
        out = fn(*args)
        assert float(out[2]) < float(out[1])  # candidate cost decreased

    @pytest.mark.slow  # the driver executes dryrun_multichip directly
    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        g.dryrun_multichip(8)
