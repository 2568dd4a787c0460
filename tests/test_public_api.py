"""Public API surface: every reference-parity symbol is exported and
constructible (guards the package contract that COVERAGE.md documents)."""

import numpy as np

import ceres_tpu as ct


def test_types_and_enums():
    for name in ["MinimizerType", "TrustRegionStrategyType", "DoglegType",
                 "LinearSolverType", "PreconditionerType",
                 "VisibilityClusteringType", "LineSearchDirectionType",
                 "NonlinearConjugateGradientType", "LineSearchType",
                 "LineSearchInterpolationType", "NumericDiffMethodType",
                 "CovarianceAlgorithmType", "TerminationType",
                 "CallbackReturnType", "LoggingType", "SolverOptions",
                 "SolverSummary", "IterationSummary",
                 "ParameterBlockOrdering"]:
        assert hasattr(ct, name), name
    # every reference linear solver type present
    for s in ["DENSE_QR", "DENSE_NORMAL_CHOLESKY", "SPARSE_NORMAL_CHOLESKY",
              "CGNR", "DENSE_SCHUR", "SPARSE_SCHUR", "ITERATIVE_SCHUR"]:
        assert hasattr(ct.LinearSolverType, s), s
    for p in ["IDENTITY", "JACOBI", "SCHUR_JACOBI",
              "SCHUR_POWER_SERIES_EXPANSION", "CLUSTER_JACOBI",
              "CLUSTER_TRIDIAGONAL", "SUBSET"]:
        assert hasattr(ct.PreconditionerType, p), p


def test_losses_constructible():
    for loss in [ct.TrivialLoss(), ct.HuberLoss(1.0), ct.SoftLOneLoss(1.0),
                 ct.CauchyLoss(1.0), ct.ArctanLoss(1.0),
                 ct.TolerantLoss(1.0, 2.0), ct.TukeyLoss(1.0),
                 ct.ScaledLoss(ct.HuberLoss(1.0), 2.0),
                 ct.ComposedLoss(ct.HuberLoss(1.0), ct.CauchyLoss(1.0)),
                 ct.LossFunctionWrapper(ct.HuberLoss(1.0))]:
        rho = loss.evaluate(np.float64(2.0))
        assert len(rho) == 3


def test_manifolds_constructible():
    ms = [ct.EuclideanManifold(3), ct.SubsetManifold(4, [1]),
          ct.QuaternionManifold(), ct.EigenQuaternionManifold(),
          ct.SphereManifold(3), ct.LineManifold(3),
          ct.ProductManifold(ct.QuaternionManifold(),
                             ct.EuclideanManifold(3))]
    for m in ms:
        assert m.ambient_size > 0 and m.tangent_size > 0


def test_cost_functions_constructible():
    from ceres_tpu.cost import (AutoDiffCostFunction,
                                ConditionedCostFunction,
                                CostFunctionToFunctor,
                                DynamicAutoDiffCostFunction,
                                DynamicNumericDiffCostFunction,
                                NormalPrior, NumericDiffCostFunction,
                                NumericDiffOptions, SizedCostFunction)

    def f(x):
        return x - 1.0

    assert AutoDiffCostFunction(f, 2, [2]).num_residuals == 2
    assert NumericDiffCostFunction(
        f, num_residuals=2, parameter_block_sizes=[2],
        method=ct.NumericDiffMethodType.RIDDERS,
        options=NumericDiffOptions()).num_residuals == 2
    d = DynamicAutoDiffCostFunction(lambda ps: ps[0])
    d.add_parameter_block(2)
    d.set_num_residuals(2)
    assert NormalPrior(np.eye(2), np.zeros(2)).num_residuals == 2


def test_aux_modules_present():
    import ceres_tpu.c_api
    import ceres_tpu.capi
    import ceres_tpu.checkpoint
    import ceres_tpu.covariance
    import ceres_tpu.gradient_checker
    import ceres_tpu.gradient_problem
    import ceres_tpu.interpolation
    import ceres_tpu.native
    import ceres_tpu.ordering
    import ceres_tpu.tiny_solver
    import ceres_tpu.parallel.sharded
    import ceres_tpu.solvers.clustering
    import ceres_tpu.solvers.sparse_direct
    assert hasattr(ct, "solve") and hasattr(ct, "Problem")
    assert hasattr(ct.rotation, "EULER_SYSTEMS")
    assert len(ct.rotation.EULER_SYSTEMS) == 24
