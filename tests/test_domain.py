"""Geometry tests: masks must reproduce the reference's Г-domain predicates
(reference solver/grid_system.cpp:17-43,86-101) exactly."""

import numpy as np
import pytest

from iterative_solvers_tpu.core.domain import Domain2D, Domain3D
from iterative_solvers_tpu.core import ordering


def reference_masks(nx, ny):
    """Direct transcription of the reference's geometry *predicates* (as
    specifications, solver/grid_system.cpp:17-43) for cross-checking."""
    interior = np.zeros((ny + 1, nx + 1), dtype=bool)
    boundary = np.zeros((ny + 1, nx + 1), dtype=bool)
    exterior = np.zeros((ny + 1, nx + 1), dtype=bool)
    for iy in range(ny + 1):
        for ix in range(nx + 1):
            left = (ix == 0 and ny // 2 <= iy <= ny) or (
                ix == nx // 2 and 0 <= iy <= ny // 2
            )
            right = ix == nx
            top = iy == ny
            bottom = (iy == 0 and nx // 2 <= ix <= nx) or (
                iy == ny // 2 and 0 <= ix <= nx // 2
            )
            excluded = ix < nx // 2 and iy < ny // 2
            if excluded:
                exterior[iy, ix] = True
            elif left or right or top or bottom:
                boundary[iy, ix] = True
            else:
                interior[iy, ix] = True
    return interior, boundary, exterior


@pytest.mark.parametrize("n", [4, 6, 8, 30])
def test_gamma_masks_match_reference(n):
    dom = Domain2D(nx=n, ny=n)
    ref_int, ref_bnd, ref_ext = reference_masks(n, n)
    np.testing.assert_array_equal(dom.interior, ref_int)
    np.testing.assert_array_equal(dom.boundary, ref_bnd)
    np.testing.assert_array_equal(dom.exterior, ref_ext)


def test_gamma_6x6_has_16_unknowns():
    # The golden system size (reference check.py:2-21 16x16 matrix).
    assert Domain2D(nx=6, ny=6).num_unknowns == 16


def test_masks_partition_grid():
    dom = Domain2D(nx=10, ny=10)
    total = dom.interior.astype(int) + dom.boundary.astype(int) + dom.exterior.astype(int)
    np.testing.assert_array_equal(total, np.ones(dom.grid_shape, dtype=int))


def test_rect_domain():
    dom = Domain2D(nx=8, ny=5, shape="rect")
    assert dom.num_unknowns == 7 * 4
    assert not dom.exterior.any()


def test_coords_and_steps():
    dom = Domain2D(nx=6, ny=6)  # [1,2]² default (reference main.cpp:617-620)
    assert dom.hx == pytest.approx(1.0 / 6.0)
    assert dom.coeff_diag == pytest.approx(-144.0)
    assert dom.coeff_x == pytest.approx(36.0)
    X, Y = dom.coords()
    assert X[0, 0] == 1.0 and X[0, -1] == 2.0
    assert Y[0, 0] == 1.0 and Y[-1, 0] == 2.0


def test_reference_ordering_is_rowmajor():
    # The compacted numbering (grid_system.cpp:84-111) == row-major over the
    # interior mask; verified node by node.
    for n in (6, 8, 12):
        dom = Domain2D(nx=n, ny=n)
        idx = ordering.interior_indices(dom)
        lin_to_rank = {lin: r for r, lin in enumerate(idx)}
        for iy in range(n + 1):
            for ix in range(n + 1):
                if dom.interior[iy, ix]:
                    lin = iy * (n + 1) + ix
                    assert ordering.reference_position(dom, ix, iy) == lin_to_rank[lin]


def test_pack_unpack_roundtrip():
    import jax.numpy as jnp

    dom = Domain2D(nx=8, ny=8)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(dom.num_unknowns))
    f = ordering.unpack(v, dom)
    np.testing.assert_allclose(np.asarray(ordering.pack(f, dom)), np.asarray(v))
    # off-interior is fill value
    assert np.all(np.asarray(f)[~dom.interior] == 0.0)


def test_domain3d_basics():
    dom = Domain3D(nx=4, ny=4, nz=4)
    assert dom.num_unknowns == 27
    assert dom.interior.sum() == 27
    assert dom.coeff_diag == pytest.approx(-2 * 3 * 16.0)


def test_mask_spec_matches_host_masks():
    """MaskSpec (in-trace iota masks — see core/domain.py) must reproduce the
    host 8-neighborhood construction exactly, including non-square grids and
    padded canvases (the Pallas operators' layouts)."""
    import dataclasses as dc

    from iterative_solvers_tpu.core.domain import Domain3D

    doms = [
        Domain2D(nx=6, ny=6),
        Domain2D(nx=8, ny=12),
        Domain2D(nx=16, ny=8),
        Domain2D(nx=30, ny=30),
        Domain2D(nx=7, ny=9, shape="rect"),
        Domain2D(nx=30, ny=48, shape="rect"),
    ]
    for dom in doms:
        spec = dom.mask_spec
        assert (np.asarray(dom.interior_traced()) == dom.interior).all(), dom
        assert (np.asarray(dom.boundary_traced()) == dom.boundary).all(), dom
        pspec = dc.replace(spec, shape=(spec.shape[0] + 5, spec.shape[1] + 7))
        ref = np.zeros(pspec.shape, bool)
        ref[: spec.shape[0], : spec.shape[1]] = dom.interior
        assert (np.asarray(pspec.build()) == ref).all(), dom
        assert (pspec.build_host() == ref).all(), dom
    for d3 in (Domain3D(4, 5, 6), Domain3D(8, 8, 8)):
        assert (np.asarray(d3.interior_traced()) == d3.interior).all()
        assert (np.asarray(d3.boundary_traced()) == d3.boundary).all()
        spec = d3.mask_spec
        pspec = dc.replace(
            spec, shape=(spec.shape[0], spec.shape[1] + 3, spec.shape[2] + 1)
        )
        ref = np.zeros(pspec.shape, bool)
        ref[: spec.shape[0], : spec.shape[1], : spec.shape[2]] = d3.interior
        assert (np.asarray(pspec.build()) == ref).all()
        assert (pspec.build_host() == ref).all()


def test_custom_shape_has_no_mask_spec():
    dom = Domain2D(
        nx=16, ny=16, shape="custom",
        inside_fn=lambda ix, iy: (ix + iy) % 2 == 0,
    )
    assert dom.mask_spec is None
    assert (np.asarray(dom.interior_traced()) == dom.interior).all()
    assert (np.asarray(dom.boundary_traced()) == dom.boundary).all()
