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


def test_textio_format_matches_python():
    """Native bulk formatter must be byte-identical to the Python '%.17e'
    fallback (results files should not depend on which engine wrote them)."""
    from iterative_solvers_tpu.native import loader

    v = np.random.default_rng(3).standard_normal(1000)
    v[::100] = [0.0, -0.0, 1e-300, 1e300, -1.5, 2.0, 3.25, 1e-17, -7.0, 42.0]
    raw = loader.format_doubles(v)
    if raw is None:
        pytest.skip("no C++ compiler available")
    assert raw.decode("ascii") == "".join(f"{x:.17e}\n" for x in v)


def test_textio_parse_roundtrip_and_sentinel():
    from iterative_solvers_tpu.native import loader

    v = np.random.default_rng(4).standard_normal(500)
    raw = loader.format_doubles(v)
    if raw is None:
        pytest.skip("no C++ compiler available")
    out = loader.parse_doubles(raw + b"SECTION\n1.0\n2.0\n", 10_000)
    vals, consumed = out
    assert consumed == len(raw)  # stopped exactly at the section header
    np.testing.assert_array_equal(vals, v)  # bit-exact through 17 digits


def test_textio_xyz():
    from iterative_solvers_tpu.native import loader

    x, y, z = np.ones(3), np.arange(3.0), np.full(3, -2.5)
    raw = loader.format_xyz(x, y, z)
    if raw is None:
        pytest.skip("no C++ compiler available")
    lines = raw.decode().splitlines()
    assert len(lines) == 3
    assert [float(t) for t in lines[1].split()] == [1.0, 1.0, -2.5]


def test_results_io_large_roundtrip(tmp_path):
    """Full save/load through the native path at a size where the bulk
    engine actually engages."""
    from iterative_solvers_tpu.api import DirichletSolver
    from iterative_solvers_tpu.results_io import load_results, save_results
    from iterative_solvers_tpu.solvers.stopping import StopConfig

    s = DirichletSolver(
        nx=48, ny=48,
        stop=StopConfig(eps_precision=-1, eps_residual=1e-3, max_iterations=2000),
    )
    res = s.solve(record_history=False)
    p = str(tmp_path / "big.txt")
    save_results(p, res)
    loaded, _ = load_results(p)
    np.testing.assert_array_equal(loaded.solution, res.solution)
    np.testing.assert_array_equal(loaded.residual, res.residual)
    assert loaded.iterations == res.iterations


def test_native_3d_assembly_matches_numpy():
    # The 7-point C++ engine must emit byte-identical CSR to the vectorized
    # NumPy builder (same compacted z,y,x row-major ranks, ascending columns).
    from iterative_solvers_tpu.core.domain import Domain3D
    from iterative_solvers_tpu.native.loader import assemble_csr_native
    from iterative_solvers_tpu.ops.sparse import assemble_csr

    dom = Domain3D(nx=6, ny=5, nz=4)
    native = assemble_csr_native(dom)
    if native is None:
        pytest.skip("no C++ compiler available")
    rm_n, en_n, vv_n = native
    rm_p, en_p, vv_p = assemble_csr(dom, backend="numpy")
    np.testing.assert_array_equal(rm_n, rm_p)
    np.testing.assert_array_equal(en_n, en_p)
    np.testing.assert_array_equal(vv_n, vv_p)
