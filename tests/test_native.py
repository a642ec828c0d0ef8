"""Native C++ host-runtime parity: the ctypes library must reproduce the
Python OBJ parser and BVH builder exactly."""

import os

import numpy as np
import pytest

from srt_tpu.utils import procgen
from srt_tpu.utils.bvh import build_bvh, triangle_bvh
from srt_tpu.utils.native import available, build_bvh_native, load_object_native
from srt_tpu.utils.obj_loader import load_object

pytestmark = pytest.mark.skipif(
    not available(), reason="native library not built"
)

REF_RUBIK = "/root/reference/objects/Rubik/Rubik.obj"


def test_native_obj_matches_python(tmp_path):
    mesh = procgen.rubik_grid()
    path = str(tmp_path / "grid.obj")
    procgen.write_obj(path, mesh)

    py = load_object(path, use_native="never")
    nat = load_object_native(path)
    assert nat is not None
    np.testing.assert_array_equal(nat.tri_vidx, py.tri_vidx)
    np.testing.assert_array_equal(nat.tri_mat, py.tri_mat)
    np.testing.assert_allclose(nat.positions, py.positions, rtol=1e-6)
    np.testing.assert_allclose(nat.uvs, py.uvs, rtol=1e-6)
    assert len(nat.materials) == len(py.materials)
    for a, b in zip(nat.materials, py.materials):
        np.testing.assert_allclose(a.diffuse, b.diffuse, rtol=1e-6)
        np.testing.assert_allclose(a.specular, b.specular, rtol=1e-6)
        assert a.use_texture == b.use_texture


@pytest.mark.skipif(not os.path.exists(REF_RUBIK), reason="reference assets absent")
def test_native_obj_reference_rubik():
    py = load_object(REF_RUBIK, use_native="never")
    nat = load_object_native(REF_RUBIK)
    assert nat.num_triangles == py.num_triangles == 1188
    np.testing.assert_allclose(nat.positions, py.positions, rtol=1e-6)
    np.testing.assert_array_equal(nat.tri_mat, py.tri_mat)


def test_native_bvh_matches_python():
    mesh = procgen.uv_sphere(20, 30)
    v0 = mesh.positions[mesh.tri_vidx[:, 0]]
    v1 = mesh.positions[mesh.tri_vidx[:, 1]]
    v2 = mesh.positions[mesh.tri_vidx[:, 2]]
    centers = (v0 + v1 + v2) / 3.0
    bmin = np.minimum(np.minimum(v0, v1), v2)
    bmax = np.maximum(np.maximum(v0, v1), v2)

    py = build_bvh(centers, bmin, bmax, use_native="never")
    nat = build_bvh_native(centers, bmin, bmax)
    assert nat is not None
    assert nat.num_nodes == py.num_nodes
    np.testing.assert_array_equal(nat.node_first, py.node_first)
    np.testing.assert_array_equal(nat.node_count, py.node_count)
    np.testing.assert_array_equal(nat.prim_order, py.prim_order)
    np.testing.assert_allclose(nat.node_min, py.node_min, rtol=1e-6)
    np.testing.assert_allclose(nat.node_max, py.node_max, rtol=1e-6)
