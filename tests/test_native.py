"""Native C++ assembly engine vs the NumPy builder — must agree exactly."""

import numpy as np
import pytest

from iterative_solvers_tpu.core.domain import Domain2D
from iterative_solvers_tpu.core import ordering
from iterative_solvers_tpu import native
from iterative_solvers_tpu.ops.sparse import assemble_csr

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native engine"
)


@pytest.mark.parametrize(
    "nx,ny,shape",
    [(6, 6, "gamma"), (30, 30, "gamma"), (64, 64, "gamma"), (12, 20, "rect"), (33, 17, "rect"), (10, 6, "gamma")],
)
def test_native_csr_equals_numpy(nx, ny, shape):
    dom = Domain2D(nx=nx, ny=ny, shape=shape)
    rm_n, en_n, va_n = assemble_csr(dom, backend="native")
    rm_p, en_p, va_p = assemble_csr(dom, backend="numpy")
    np.testing.assert_array_equal(rm_n, rm_p)
    np.testing.assert_array_equal(en_n, en_p)
    np.testing.assert_array_equal(va_n, va_p)


@pytest.mark.parametrize("nx,ny,shape", [(6, 6, "gamma"), (14, 10, "rect"), (10, 6, "gamma")])
def test_native_counts_and_coords(nx, ny, shape):
    dom = Domain2D(nx=nx, ny=ny, shape=shape)
    assert native.num_unknowns_native(dom) == dom.num_unknowns
    xs, ys = native.node_coords_native(dom)
    xs_p, ys_p = ordering.node_coordinates(dom)
    np.testing.assert_allclose(xs, xs_p, rtol=1e-15)
    np.testing.assert_allclose(ys, ys_p, rtol=1e-15)


def test_native_rejects_custom_domain():
    dom = Domain2D(nx=8, ny=8, shape="custom", inside_fn=lambda ix, iy: ix + iy < 12)
    assert native.assemble_csr_native(dom) is None
    with pytest.raises(RuntimeError):
        assemble_csr(dom, backend="native")


def test_auto_backend_used_in_default_path():
    # default assemble_csr must give identical results whichever engine ran
    dom = Domain2D(nx=16, ny=16)
    rm, en, va = assemble_csr(dom)
    rm_p, en_p, va_p = assemble_csr(dom, backend="numpy")
    np.testing.assert_array_equal(rm, rm_p)
    np.testing.assert_array_equal(en, en_p)
    np.testing.assert_array_equal(va, va_p)
