"""Wavefront OBJ/MTL asset pipeline (host side).

Python re-implementation of the reference's C++ asset layer
(src/asset_utils/model_loader.cpp) with the same parsing semantics:

* OBJ: ``v/vt/vn/f/usemtl/mtllib`` handled; faces may be triangles or quads,
  quads split into (0,1,2) + (0,2,3) (model_loader.cpp:110-142); indices are
  1-based in the file (negative indices also supported here); lines are
  CRLF-trimmed (:51-52); sub-geometry per ``usemtl`` run (:144-153).
* MTL: ``newmtl/Kd/Ks/Ns/Ke/map_Kd`` parsed; ``Ka/Tf/Ni/d/illum/Tr/map_Ka``
  recognized and ignored (model_loader.cpp:179-278).  The reference's
  ineffective duplicate-material skip (``skip_mtl`` reset every line,
  :200-219) is fixed: later duplicates are actually skipped.
* Geometry -> model conversion: vertices are duplicated per face corner into
  a packed (position, uv) buffer and triangles store three vertex indices
  plus a material index (model_loader.cpp:296-331).

A faster C++ implementation of the same format lives in native/ and is used
automatically when built (srt_tpu.utils.native); this module is the always-
available fallback and the correctness reference for it.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class MaterialDef:
    """One MTL material (reference ``AssetUtils::Material``,
    asset_utils/types.h)."""

    diffuse: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    specular: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    specular_ex: float = 0.0
    use_texture: bool = False
    texture_path: Optional[str] = None
    # The reference recognizes Ke but drops it (model_loader.cpp:240-273);
    # here emissive materials are first-class (mesh area emitters).
    emissive: Tuple[float, float, float] = (0.0, 0.0, 0.0)


@dataclasses.dataclass
class MeshData:
    """Host-side packed mesh, the analog of ``AssetUtils::Model``
    (asset_utils/types.h:39-52) before BVH build.

    positions: [V, 3] float32 — duplicated per face corner
    uvs:       [V, 2] float32
    tri_vidx:  [T, 3] uint32 vertex indices
    tri_mat:   [T]    uint32 material index
    materials: ordered material defs
    """

    positions: np.ndarray
    uvs: np.ndarray
    tri_vidx: np.ndarray
    tri_mat: np.ndarray
    materials: List[MaterialDef]
    name: str = "mesh"
    # Optional per-corner shading normals ([V, 3], unit or zero).  The
    # reference parses ``vn`` and discards it (model_loader.cpp:296-331
    # packs pos+uv only); here they enable smooth shading — zero rows fall
    # back to the geometric normal per hit.
    normals: Optional[np.ndarray] = None

    @property
    def num_triangles(self) -> int:
        return self.tri_vidx.shape[0]


def _resolve_index(raw: int, count: int) -> int:
    """OBJ 1-based (or negative-relative) index -> 0-based."""
    return raw - 1 if raw > 0 else count + raw


def parse_obj(path: str):
    """Parse an OBJ file.

    Returns (vertices [V0,3], texcoords [Vt,2], normals [Vn,3],
    sub_geometries, mtl_files) where sub_geometries is a list of
    (material_name, faces) and each face is a list of (v, vt, vn) index
    triples (vt/vn may be None).  Mirrors ``Detail::ParseOBJ``
    (model_loader.cpp:35-177).
    """
    vertices: List[Tuple[float, float, float]] = []
    texcoords: List[Tuple[float, float]] = []
    normals: List[Tuple[float, float, float]] = []
    mtl_files: List[str] = []
    sub_geos: List[Tuple[str, list]] = []
    cur_material = ""
    cur_faces: list = []

    def flush():
        nonlocal cur_faces
        # The reference only flushes when a material was set
        # (model_loader.cpp:146-148,173-174).
        if cur_material or cur_faces:
            sub_geos.append((cur_material, cur_faces))
        cur_faces = []

    with open(path, "r", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            prefix = parts[0]
            if prefix == "v" and len(parts) >= 4:
                vertices.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif prefix == "vt" and len(parts) >= 3:
                texcoords.append((float(parts[1]), float(parts[2])))
            elif prefix == "vn" and len(parts) >= 4:
                normals.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif prefix == "f":
                corners = []
                for chunk in parts[1:]:
                    fields = chunk.split("/")
                    v = _resolve_index(int(fields[0]), len(vertices))
                    vt = (
                        _resolve_index(int(fields[1]), len(texcoords))
                        if len(fields) > 1 and fields[1] else None
                    )
                    vn = (
                        _resolve_index(int(fields[2]), len(normals))
                        if len(fields) > 2 and fields[2] else None
                    )
                    corners.append((v, vt, vn))
                if len(corners) == 3:
                    cur_faces.append(corners)
                elif len(corners) == 4:
                    # Quad -> two triangles (model_loader.cpp:110-142).
                    cur_faces.append([corners[0], corners[1], corners[2]])
                    cur_faces.append([corners[0], corners[2], corners[3]])
                elif len(corners) > 4:
                    # Fan-triangulate n-gons (reference rejects these with a
                    # warning; supporting them is a capability superset).
                    for k in range(1, len(corners) - 1):
                        cur_faces.append([corners[0], corners[k], corners[k + 1]])
            elif prefix == "usemtl":
                if cur_material or cur_faces:
                    flush()
                cur_material = parts[1] if len(parts) > 1 else ""
            elif prefix == "mtllib":
                if len(parts) > 1:
                    mtl_files.append(parts[1])
            # s / o / g ignored like the reference (model_loader.cpp:160-168)

    flush()
    return (
        np.asarray(vertices, np.float32).reshape(-1, 3),
        np.asarray(texcoords, np.float32).reshape(-1, 2),
        np.asarray(normals, np.float32).reshape(-1, 3),
        sub_geos,
        mtl_files,
    )


def parse_mtl(path: str, materials: Dict[str, MaterialDef]) -> None:
    """Parse an MTL library into ``materials`` (``Detail::ParseMTL``,
    model_loader.cpp:179-278)."""
    if not os.path.exists(path):
        return
    folder = os.path.dirname(path)
    current: Optional[MaterialDef] = None
    skip = False
    with open(path, "r", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            prefix = parts[0]
            if prefix == "newmtl":
                name = parts[1] if len(parts) > 1 else ""
                if name in materials:
                    # Fixed version of the reference's broken skip_mtl
                    # (model_loader.cpp:200-219).
                    skip = True
                    current = None
                else:
                    skip = False
                    current = MaterialDef()
                    materials[name] = current
                continue
            if skip or current is None:
                continue
            if prefix == "Kd" and len(parts) >= 4:
                current.diffuse = (float(parts[1]), float(parts[2]), float(parts[3]))
            elif prefix == "Ks" and len(parts) >= 4:
                current.specular = (float(parts[1]), float(parts[2]), float(parts[3]))
            elif prefix == "Ns" and len(parts) >= 2:
                current.specular_ex = float(parts[1])
            elif prefix == "map_Kd" and len(parts) >= 2:
                current.use_texture = True
                current.texture_path = os.path.join(folder, parts[-1])
            elif prefix == "Ke" and len(parts) >= 4:
                current.emissive = (float(parts[1]), float(parts[2]),
                                    float(parts[3]))
            # Ka/Tf/Ni/d/illum/Tr/map_Ka recognized but ignored (as in the
            # reference, model_loader.cpp:240-273).


def compute_vertex_normals(mesh: MeshData) -> MeshData:
    """Area-weighted smooth vertex normals for a mesh without ``vn``.

    Corners are duplicated per face (model_loader.cpp:296-331 layout), so
    coincident positions are re-identified by exact coordinate match and
    face normals (cross-product, area-weighted) are accumulated over each
    shared position.  Returns a new MeshData with ``normals`` set —
    opt-in smooth shading for procedural/vn-less assets."""
    import dataclasses as _dc

    p = mesh.positions
    vidx = mesh.tri_vidx.astype(np.int64)
    fn = np.cross(p[vidx[:, 1]] - p[vidx[:, 0]],
                  p[vidx[:, 2]] - p[vidx[:, 0]])        # area-weighted
    # Group duplicated corners by exact position.
    _, group = np.unique(np.asarray(p, np.float32), axis=0,
                         return_inverse=True)
    group = group.ravel()
    acc = np.zeros((group.max() + 1, 3), np.float64)
    for c in range(3):
        np.add.at(acc, group[vidx[:, c]], fn)
    n = acc[group]
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    n = np.where(ln > 1e-12, n / np.maximum(ln, 1e-12), 0.0)
    return _dc.replace(mesh, normals=n.astype(np.float32))


def load_object(obj_path: str, use_native: str = "auto") -> MeshData:
    """Load an OBJ + its MTL libraries into a packed MeshData
    (``AssetUtils::LoadObject``, model_loader.cpp:20-32 +
    ``ConvertCPUGeometryToModel`` :280-365).

    Vertices are duplicated per face corner — positions+uvs packed — and
    each triangle records (v0, v1, v2, material).

    ``use_native``: "auto" tries the C++ parser (native/srt_native.cpp,
    identical semantics, ~20x faster on large files) and falls back here;
    "never" forces this Python implementation.
    """
    if use_native == "auto":
        from srt_tpu.utils.native import load_object_native
        mesh = load_object_native(obj_path)
        if mesh is not None:
            return mesh
    vertices, texcoords, normals_in, sub_geos, mtl_files = parse_obj(obj_path)

    folder = os.path.dirname(obj_path)
    materials: Dict[str, MaterialDef] = {}
    for mtl in mtl_files:
        parse_mtl(os.path.join(folder, mtl), materials)

    mat_names = list(materials.keys())
    mat_index = {n: i for i, n in enumerate(mat_names)}
    mat_list = [materials[n] for n in mat_names]
    if not mat_list:
        mat_list = [MaterialDef()]

    positions: List[np.ndarray] = []
    uvs: List[Tuple[float, float]] = []
    nrm: List[Tuple[float, float, float]] = []
    tri_vidx: List[Tuple[int, int, int]] = []
    tri_mat: List[int] = []
    any_vn = False

    for mat_name, faces in sub_geos:
        midx = mat_index.get(mat_name, 0)
        for face in faces:
            corner_ids = []
            for (v, vt, vn) in face:
                corner_ids.append(len(positions))
                positions.append(vertices[v])
                uvs.append(tuple(texcoords[vt]) if vt is not None else (0.0, 0.0))
                if vn is not None:
                    nrm.append(tuple(normals_in[vn]))
                    any_vn = True
                else:
                    nrm.append((0.0, 0.0, 0.0))
            tri_vidx.append(tuple(corner_ids))
            tri_mat.append(midx)

    return MeshData(
        positions=np.asarray(positions, np.float32).reshape(-1, 3),
        uvs=np.asarray(uvs, np.float32).reshape(-1, 2),
        tri_vidx=np.asarray(tri_vidx, np.uint32).reshape(-1, 3),
        tri_mat=np.asarray(tri_mat, np.uint32),
        materials=mat_list,
        name=os.path.splitext(os.path.basename(obj_path))[0],
        normals=(np.asarray(nrm, np.float32).reshape(-1, 3)
                 if any_vn else None),
    )
