"""C API tests (reference include/ceres/c_api.h / internal/ceres/c_api.cc
and examples/curve_fitting.c): ctypes-level use of ceres_tpu.c_api, and the
full embedded-interpreter path — compile the shim + a real C program, run
it as a subprocess."""

import ctypes
import os
import subprocess
import sys
from ctypes import POINTER, c_double, c_int, c_void_p

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_c_api_python_level():
    from ceres_tpu import c_api

    xs = np.linspace(0.0, 5.0, 15)
    ys = np.exp(0.3 * xs + 0.1)
    table = np.stack([xs, ys], axis=1).astype(np.float64)
    table = np.ascontiguousarray(table)

    @c_api.CERES_COST_FUNC_T
    def cost(user_data, params, residuals, jacobians):
        row = ctypes.cast(user_data, POINTER(c_double))
        x, y = row[0], row[1]
        m, c = params[0][0], params[1][0]
        e = np.exp(m * x + c)
        residuals[0] = y - e
        if jacobians:
            if jacobians[0]:
                jacobians[0][0] = -x * e
            if jacobians[1]:
                jacobians[1][0] = -e
        return 1

    pid = c_api.create_problem()
    m = np.array([0.0])
    c = np.array([0.0])
    cost_ptr = ctypes.cast(cost, c_void_p).value
    for i in range(len(xs)):
        c_api.add_residual_block(
            pid, cost_ptr, table[i].ctypes.data, 0, 0, 1, [1, 1],
            [m.ctypes.data, c.ctypes.data])
    report = c_api.solve(pid)
    assert "CONVERGENCE" in report
    np.testing.assert_allclose([m[0], c[0]], [0.3, 0.1], atol=1e-6)
    c_api.free_problem(pid)


def test_c_api_failing_cost_is_invalid_step():
    """A C cost returning 0 poisons the evaluation (NaNs), which the solver
    must survive at candidate points (residual_block_utils semantics)."""
    from ceres_tpu import c_api

    @c_api.CERES_COST_FUNC_T
    def cost(user_data, params, residuals, jacobians):
        x = params[0][0]
        if x > 4.0:
            return 0  # fail beyond x = 4
        residuals[0] = 3.0 - x
        if jacobians and jacobians[0]:
            jacobians[0][0] = -1.0
        return 1

    pid = c_api.create_problem()
    x = np.array([1.0])
    c_api.add_residual_block(
        pid, ctypes.cast(cost, c_void_p).value, 0, 0, 0, 1, [1],
        [x.ctypes.data])
    report = c_api.solve(pid)
    assert "CONVERGENCE" in report
    np.testing.assert_allclose(x[0], 3.0, atol=1e-8)
    c_api.free_problem(pid)


@pytest.mark.skipif(not os.path.exists("/usr/bin/gcc")
                    and not os.path.exists("/usr/local/bin/gcc"),
                    reason="no C compiler")
def test_embedded_c_program(tmp_path):
    from ceres_tpu import capi
    if not capi.available():
        pytest.skip("embedding toolchain unavailable")
    exe = str(tmp_path / "curve_fitting_c")
    src = os.path.join(REPO, "ceres_tpu", "examples", "curve_fitting_c",
                       "curve_fitting.c")
    subprocess.run(
        ["gcc", "-O2", src, "-I" + os.path.dirname(capi.HEADER),
         "-L" + os.path.dirname(capi.LIB), "-lceres_tpu_c",
         "-Wl,-rpath," + os.path.dirname(capi.LIB), "-o", exe, "-lm"],
        check=True, capture_output=True)
    env = dict(os.environ, PYTHONPATH=REPO, CERES_TPU_FORCE_CPU="1")
    out = subprocess.run([exe], env=env, capture_output=True, text=True,
                         timeout=600)
    assert "CURVE_FITTING_C_OK" in out.stdout, (out.stdout, out.stderr)


@pytest.mark.skipif(not os.path.exists("/usr/bin/gcc")
                    and not os.path.exists("/usr/local/bin/gcc"),
                    reason="no C compiler")
def test_embedded_c_program_multithreaded(tmp_path):
    """The host app may init on one thread and solve from another: the
    shim must release the GIL Py_Initialize leaves held (regression for
    a permanent deadlock in PyGILState_Ensure from thread B) and build
    every argument tuple under the GIL."""
    from ceres_tpu import capi
    if not capi.available():
        pytest.skip("embedding toolchain unavailable")
    src = tmp_path / "mt.c"
    src.write_text(r'''
#include <stdio.h>
#include <math.h>
#include <pthread.h>
#include "ceres_tpu_c.h"
static int cost(void* user, double** params, double* res, double** jac) {
  double m = params[0][0], c = params[1][0];
  double* d = (double*)user;
  double e = exp(m * d[0] + c);
  res[0] = d[1] - e;
  if (jac) {
    if (jac[0]) jac[0][0] = -d[0] * e;
    if (jac[1]) jac[1][0] = -e;
  }
  return 1;
}
static double data[8][2];
static double m = 0.0, c = 0.0;
static void* worker(void* arg) {
  (void)arg;
  ceres_problem_t* p = ceres_create_problem();
  double* blocks[2] = {&m, &c};
  int sizes[2] = {1, 1};
  for (int i = 0; i < 8; ++i)
    ceres_problem_add_residual_block(p, cost, data[i], NULL, NULL,
                                     1, 2, sizes, blocks);
  ceres_solve(p);
  ceres_free_problem(p);
  return NULL;
}
int main(void) {
  for (int i = 0; i < 8; ++i) {
    data[i][0] = 0.5 * i;
    data[i][1] = exp(0.3 * data[i][0] + 0.1);
  }
  if (ceres_init() != 0) return 1;     /* init on MAIN thread */
  pthread_t t;                          /* solve on ANOTHER thread */
  pthread_create(&t, NULL, worker, NULL);
  pthread_join(t, NULL);
  if (fabs(m - 0.3) < 1e-5 && fabs(c - 0.1) < 1e-5)
    printf("MT_C_OK m=%g c=%g\n", m, c);
  else
    printf("MT_C_BAD m=%g c=%g\n", m, c);
  return 0;
}
''')
    exe = str(tmp_path / "mt_c")
    subprocess.run(
        ["gcc", "-O2", str(src), "-I" + os.path.dirname(capi.HEADER),
         "-L" + os.path.dirname(capi.LIB), "-lceres_tpu_c",
         "-Wl,-rpath," + os.path.dirname(capi.LIB), "-o", exe,
         "-lm", "-lpthread"],
        check=True, capture_output=True)
    env = dict(os.environ, PYTHONPATH=REPO, CERES_TPU_FORCE_CPU="1")
    out = subprocess.run([exe], env=env, capture_output=True, text=True,
                         timeout=600)
    assert "MT_C_OK" in out.stdout, (out.stdout, out.stderr)
