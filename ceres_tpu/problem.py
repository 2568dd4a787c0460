"""Problem: the mutable graph of parameter blocks and residual blocks.

Capability parity with the reference's Problem (include/ceres/problem.h:120-532,
internal/ceres/problem_impl.cc): AddParameterBlock / AddResidualBlock (:267),
constancy, bounds, manifolds, removal, and Evaluate (:585).

Parameter blocks are identified by the *numpy array object* the user passes
(the reference keys on the double* pointer). Arrays must be 1-D float
np.ndarrays; the solver writes results back into them in place, matching the
reference's user-owned-memory semantics.

Everything per-iteration is compiled by program.py into pure jitted
functions; the Problem itself stays host-side Python.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .cost import CostFunction
from .loss import LossFunction
from .manifolds import EuclideanManifold, Manifold


class _ParamBlock:
    __slots__ = ("array", "size", "manifold", "constant", "lower", "upper",
                 "index")

    def __init__(self, array: np.ndarray, index: int):
        self.array = array
        self.size = int(array.size)
        self.manifold: Optional[Manifold] = None
        self.constant = False
        self.lower = None   # lazily allocated np arrays
        self.upper = None
        self.index = index

    @property
    def tangent_size(self) -> int:
        if self.constant:
            return 0
        return self.manifold.tangent_size if self.manifold else self.size

    def ensure_bounds(self):
        if self.lower is None:
            self.lower = np.full(self.size, -np.inf)
            self.upper = np.full(self.size, np.inf)

    @property
    def has_bounds(self) -> bool:
        return self.lower is not None


class ResidualBlockId:
    """Opaque handle returned by add_residual_block."""
    __slots__ = ("cost", "loss", "param_keys", "index")

    def __init__(self, cost, loss, param_keys, index):
        self.cost = cost
        self.loss = loss
        self.param_keys = param_keys
        self.index = index


class ProblemOptions:
    """Reference Problem::Options. Ownership enums are no-ops under GC;
    enable_fast_removal retained for API parity (removal here is O(n))."""

    def __init__(self, enable_fast_removal: bool = False,
                 cost_function_ownership=None, loss_function_ownership=None,
                 manifold_ownership=None, disable_all_safety_checks=False):
        self.enable_fast_removal = enable_fast_removal
        self.disable_all_safety_checks = disable_all_safety_checks


class Problem:
    def __init__(self, options: Optional[ProblemOptions] = None):
        self.options = options or ProblemOptions()
        self._blocks: dict[int, _ParamBlock] = {}     # id(array) -> block
        self._block_order: list[int] = []
        self._residuals: list[Optional[ResidualBlockId]] = []
        self._num_residual_blocks = 0
        self._next_param_index = 0
        self._revision = 0    # bumped on any structural change

    # ---------- parameter blocks ----------

    def _as_key(self, values) -> int:
        if not isinstance(values, np.ndarray):
            raise TypeError(
                "parameter blocks must be numpy arrays (user-owned memory); "
                f"got {type(values)}")
        return id(values)

    def _get(self, values) -> _ParamBlock:
        key = self._as_key(values)
        if key not in self._blocks:
            raise KeyError("parameter block not in problem")
        return self._blocks[key]

    def add_parameter_block(self, values: np.ndarray, size: int = None,
                            manifold: Optional[Manifold] = None):
        key = self._as_key(values)
        if values.ndim != 1:
            raise ValueError("parameter blocks must be 1-D arrays")
        if size is not None and int(size) != values.size:
            raise ValueError(f"size {size} != array size {values.size}")
        if key in self._blocks:
            blk = self._blocks[key]
            if manifold is not None:
                self.set_manifold(values, manifold)
            return values
        blk = _ParamBlock(values, self._next_param_index)
        self._next_param_index += 1
        self._blocks[key] = blk
        self._block_order.append(key)
        if manifold is not None:
            self.set_manifold(values, manifold)
        self._revision += 1
        return values

    def remove_parameter_block(self, values):
        key = self._as_key(values)
        self._get(values)
        # Remove all residual blocks that reference it (problem.h semantics).
        for i, rb in enumerate(self._residuals):
            if rb is not None and key in rb.param_keys:
                self._residuals[i] = None
                self._num_residual_blocks -= 1
        del self._blocks[key]
        self._block_order.remove(key)
        self._revision += 1

    def set_parameter_block_constant(self, values):
        self._get(values).constant = True
        self._revision += 1

    def set_parameter_block_variable(self, values):
        self._get(values).constant = False
        self._revision += 1

    def is_parameter_block_constant(self, values) -> bool:
        return self._get(values).constant

    def set_manifold(self, values, manifold: Optional[Manifold]):
        blk = self._get(values)
        if manifold is not None and manifold.ambient_size != blk.size:
            raise ValueError(
                f"manifold ambient size {manifold.ambient_size} != "
                f"block size {blk.size}")
        blk.manifold = manifold
        self._revision += 1

    def get_manifold(self, values) -> Optional[Manifold]:
        return self._get(values).manifold

    def has_manifold(self, values) -> bool:
        return self._get(values).manifold is not None

    def set_parameter_lower_bound(self, values, index: int, bound: float):
        blk = self._get(values)
        blk.ensure_bounds()
        blk.lower[index] = bound
        self._revision += 1

    def set_parameter_upper_bound(self, values, index: int, bound: float):
        blk = self._get(values)
        blk.ensure_bounds()
        blk.upper[index] = bound
        self._revision += 1

    def get_parameter_lower_bound(self, values, index: int) -> float:
        blk = self._get(values)
        return float(blk.lower[index]) if blk.lower is not None else -np.inf

    def get_parameter_upper_bound(self, values, index: int) -> float:
        blk = self._get(values)
        return float(blk.upper[index]) if blk.upper is not None else np.inf

    def parameter_block_size(self, values) -> int:
        return self._get(values).size

    def parameter_block_tangent_size(self, values) -> int:
        blk = self._get(values)
        return blk.manifold.tangent_size if blk.manifold else blk.size

    # ---------- residual blocks ----------

    def add_residual_block(self, cost_function: CostFunction,
                           loss_function: Optional[LossFunction],
                           *parameter_blocks) -> ResidualBlockId:
        if len(parameter_blocks) == 1 and isinstance(parameter_blocks[0],
                                                     (list, tuple)):
            parameter_blocks = tuple(parameter_blocks[0])
        sizes = cost_function.parameter_block_sizes
        if len(parameter_blocks) != len(sizes):
            raise ValueError(
                f"cost function expects {len(sizes)} parameter blocks, "
                f"got {len(parameter_blocks)}")
        if not self.options.disable_all_safety_checks:
            seen = set()
            for pb, s in zip(parameter_blocks, sizes):
                if not isinstance(pb, np.ndarray) or pb.size != s:
                    raise ValueError(
                        f"parameter block size mismatch: expected {s}, "
                        f"got {getattr(pb, 'size', None)}")
                if id(pb) in seen:
                    raise ValueError("duplicate parameter block in residual")
                seen.add(id(pb))
        # Fast path: blocks already registered (the common case in bulk
        # model building — e.g. 900k FoE patches over the same pixels).
        blocks = self._blocks
        keys = []
        for pb in parameter_blocks:
            k = id(pb)
            if k not in blocks:
                self.add_parameter_block(pb)
            keys.append(k)
        rb = ResidualBlockId(cost_function, loss_function, tuple(keys),
                             len(self._residuals))
        self._residuals.append(rb)
        self._num_residual_blocks += 1
        self._revision += 1
        return rb

    def remove_residual_block(self, rb: ResidualBlockId):
        if self._residuals[rb.index] is not rb:
            raise KeyError("residual block not in problem")
        self._residuals[rb.index] = None
        self._num_residual_blocks -= 1
        self._revision += 1

    # ---------- introspection ----------

    def num_parameter_blocks(self) -> int:
        return len(self._blocks)

    def num_parameters(self) -> int:
        return sum(b.size for b in self._blocks.values())

    def num_residual_blocks(self) -> int:
        return self._num_residual_blocks

    def num_residuals(self) -> int:
        return sum(rb.cost.num_residuals for rb in self._residuals
                   if rb is not None)

    def parameter_blocks(self):
        return [self._blocks[k].array for k in self._block_order]

    def residual_blocks(self):
        return [rb for rb in self._residuals if rb is not None]

    def get_parameter_blocks_for_residual_block(self, rb: ResidualBlockId):
        return [self._blocks[k].array for k in rb.param_keys]

    def get_residual_blocks_for_parameter_block(self, values):
        key = self._as_key(values)
        return [rb for rb in self._residuals
                if rb is not None and key in rb.param_keys]

    # internal accessors for program compilation
    def _param_records(self):
        return [self._blocks[k] for k in self._block_order]

    def _residual_records(self):
        return [rb for rb in self._residuals if rb is not None]

    # ---------- evaluation (problem.h:455 Problem::Evaluate) ----------

    def evaluate(self, apply_loss_function: bool = True,
                 residual_blocks=None, parameter_blocks=None,
                 want_residuals: bool = True, want_gradient: bool = False,
                 want_jacobian: bool = False):
        """Returns (cost, residuals, gradient, jacobian); entries None when
        not requested. Residuals are ordered by residual-block insertion
        order; gradient/jacobian columns follow parameter-block insertion
        order in tangent space (reference problem_impl.cc:585)."""
        from .program import CompiledProgram
        # include_fixed_blocks: Problem::Evaluate reports residuals for all
        # residual blocks, even those whose parameters are all constant.
        prog = CompiledProgram(self, apply_loss=apply_loss_function,
                               include_fixed_blocks=True)
        return prog.public_evaluate(want_residuals, want_gradient,
                                    want_jacobian)
