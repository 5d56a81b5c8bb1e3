"""Mesh file I/O: parser coverage over every real-world mesh in the reference
tree (SolidWorks, Blender, and Open3D OBJ exports), PLY ascii/binary, STL,
degenerate-face dropping, and the welding-tolerance knob.

Replaces the reference's reliance on Open3D's C++ loaders (reference
sdf.py:103-120)."""

import glob
import os
import struct

import numpy as np
import pytest

from pytorch_volumetric_tpu import mesh as m

REF = "/root/reference/tests"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference assets absent")
@pytest.mark.parametrize("path", sorted(
    glob.glob(os.path.join(REF, "**", "*.obj"), recursive=True)))
def test_parse_every_reference_obj(path):
    """Every OBJ under the reference's test tree parses to a sane mesh:
    nonempty, in-range face indices, no degenerate faces, finite vertices."""
    mesh = m.read_triangle_mesh(path)
    assert mesh.vertices.shape[0] >= 3
    assert mesh.faces.shape[0] >= 1
    assert mesh.faces.min() >= 0
    assert mesh.faces.max() < mesh.vertices.shape[0]
    assert np.isfinite(mesh.vertices).all()
    f = mesh.faces
    assert np.all((f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2])
                  & (f[:, 0] != f[:, 2]))


def _write_ply_ascii(path, verts, faces, extra_props=False):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\ncomment test\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if extra_props:
            f.write("property float nx\nproperty float ny\nproperty float nz\n")
            f.write("property uchar red\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            row = f"{v[0]} {v[1]} {v[2]}"
            if extra_props:
                row += " 0 0 1 255"
            f.write(row + "\n")
        for t in faces:
            f.write(f"{len(t)} " + " ".join(str(i) for i in t) + "\n")


def _write_ply_binary(path, verts, faces, extra_props=False):
    with open(path, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0",
               f"element vertex {len(verts)}",
               "property float x", "property float y", "property float z"]
        if extra_props:
            hdr += ["property float nx", "property float ny",
                    "property float nz", "property uchar red"]
        hdr += [f"element face {len(faces)}",
                "property list uchar int vertex_indices", "end_header"]
        f.write(("\n".join(hdr) + "\n").encode())
        for v in verts:
            f.write(struct.pack("<fff", *v))
            if extra_props:
                f.write(struct.pack("<fffB", 0.0, 0.0, 1.0, 255))
        for t in faces:
            f.write(struct.pack("<B", len(t)))
            f.write(struct.pack(f"<{len(t)}i", *t))


@pytest.mark.parametrize("writer,extra", [
    (_write_ply_ascii, False), (_write_ply_ascii, True),
    (_write_ply_binary, False), (_write_ply_binary, True)])
def test_ply_roundtrip(tmp_path, writer, extra):
    box = m.box_mesh((0.4, 0.3, 0.2))
    p = str(tmp_path / "box.ply")
    writer(p, box.vertices.astype(np.float32),
           [list(t) for t in box.faces], extra_props=extra)
    got = m.read_triangle_mesh(p)
    assert got.vertices.shape == box.vertices.shape
    assert np.allclose(got.vertices, box.vertices, atol=1e-6)
    assert np.array_equal(got.faces, box.faces)


def test_ply_quad_faces_triangulated(tmp_path):
    verts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]
    p = str(tmp_path / "quad.ply")
    _write_ply_ascii(p, verts, [[0, 1, 2, 3]])
    got = m.read_triangle_mesh(p)
    assert got.faces.shape == (2, 3)
    p2 = str(tmp_path / "quad_bin.ply")
    _write_ply_binary(p2, verts, [[0, 1, 2, 3]])
    got2 = m.read_triangle_mesh(p2)
    assert np.array_equal(got.faces, got2.faces)


def test_degenerate_faces_dropped(tmp_path):
    p = str(tmp_path / "degen.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\n")
        f.write("f 1 2 3\nf 1 1 2\nf 2 2 2\n")  # one good, two degenerate
    got = m.read_triangle_mesh(p)
    assert got.faces.shape == (1, 3)


def test_obj_quirks(tmp_path):
    """Negative indices, v/vt/vn face tokens, polygon fans, skipped
    directives (g/o/s/usemtl/mtllib) — the union of the SolidWorks, Blender
    and Open3D export styles in the reference tree."""
    p = str(tmp_path / "quirks.obj")
    with open(p, "w") as f:
        f.write("mtllib x.mtl\no thing\ng part\ns off\nusemtl mat\n")
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
        f.write("vn 0 0 1\nvt 0 0\n")
        f.write("f 1/1/1 2/1/1 3/1/1\n")     # v/vt/vn
        f.write("f -4 -2 -1\n")              # negative indices: 1, 3, 4
    got = m.read_triangle_mesh(p)
    assert got.vertices.shape == (4, 3)
    assert np.array_equal(got.faces, [[0, 1, 2], [0, 2, 3]])


def test_weld_tolerance(tmp_path):
    """An unwelded 'soup' box (each face its own vertices) closes up under
    welding: 36 -> 8 vertices, winding-number sign then sees a closed mesh."""
    box = m.box_mesh((0.2, 0.2, 0.2))
    soup_v = box.vertices[box.faces].reshape(-1, 3)  # 12 tris x 3 verts
    soup_f = np.arange(36, dtype=np.int32).reshape(-1, 3)
    p = str(tmp_path / "soup.obj")
    m.save_obj(m.TriangleMesh(soup_v, soup_f), p)

    raw = m.read_triangle_mesh(p)
    assert raw.vertices.shape[0] == 36
    welded = m.read_triangle_mesh(p, weld_tolerance=1e-9)
    assert welded.vertices.shape[0] == 8
    assert welded.faces.shape[0] == 12

    import pytorch_volumetric_tpu as pv
    import jax.numpy as jnp
    sdf = pv.MeshSDF(pv.MeshObjectFactory(p, weld_tolerance=1e-9))
    v, _ = sdf(jnp.zeros((1, 3)))
    assert float(v[0]) == pytest.approx(-0.1, abs=1e-5)  # inside the box


def test_weld_distance_semantics():
    """Welding is true distance-based: two vertices within tolerance merge
    regardless of any internal grid alignment, and vertices farther than
    tolerance apart stay distinct (chains merge transitively)."""
    # a degenerate 'mesh' of loose triangles carrying the probe vertices
    v = np.array([
        [0.0, 0.0, 0.0], [0.009, 0.0, 0.0],    # within tol=0.01 -> merge
        [1.0, 0.0, 0.0], [1.02, 0.0, 0.0],     # beyond tol -> distinct
        [2.0, 0.0, 0.0], [2.009, 0.0, 0.0], [2.018, 0.0, 0.0],  # chain
        [0.0, 5.0, 0.0], [0.0, 6.0, 0.0],      # far fill (keep faces valid)
    ])
    f = np.array([[0, 2, 7], [1, 3, 8], [4, 5, 6]], dtype=np.int32)
    w = m.weld_vertices(m.TriangleMesh(v, f), 0.01)
    # merged: {0,1}, {4,5,6} transitively; distinct: 2 vs 3
    assert w.vertices.shape[0] == 6
    # the chain collapses its triangle to a degenerate face -> dropped
    assert w.faces.shape[0] == 2
    # snap-to-grid regression: 0.0 and 0.009 straddle the round(v/0.01)
    # cell boundary at 0.005 and would NOT have merged under snapping
    xs = sorted(w.vertices[:, 0])
    assert xs.count(0.009) == 0


def test_weld_tolerance_in_memory_mesh():
    """MeshObjectFactory(mesh=..., weld_tolerance=...) welds the directly
    passed mesh just like the file-load path (advisor finding)."""
    import pytorch_volumetric_tpu as pv
    import jax.numpy as jnp

    box = m.box_mesh((0.2, 0.2, 0.2))
    soup = m.TriangleMesh(box.vertices[box.faces].reshape(-1, 3),
                          np.arange(36, dtype=np.int32).reshape(-1, 3))
    fac = pv.MeshObjectFactory(mesh=soup, weld_tolerance=1e-9)
    assert fac._mesh.vertices.shape[0] == 8
    sdf = pv.MeshSDF(fac)
    val, _ = sdf(jnp.zeros((1, 3)))
    assert float(val[0]) == pytest.approx(-0.1, abs=1e-5)


def test_stl_roundtrip_binary(tmp_path):
    box = m.box_mesh((0.3, 0.2, 0.1))
    tri = box.vertices[box.faces]  # [F, 3, 3]
    p = str(tmp_path / "box.stl")
    with open(p, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tri)))
        for t in tri:
            f.write(struct.pack("<fff", 0, 0, 0))
            for v in t:
                f.write(struct.pack("<fff", *v.astype(np.float32)))
            f.write(struct.pack("<H", 0))
    got = m.read_triangle_mesh(p)
    assert got.vertices.shape[0] == 8  # welded
    assert got.faces.shape[0] == 12
    assert np.allclose(sorted(got.vertices[:, 0]), sorted(box.vertices[:, 0]))


def test_ply_property_order_robustness(tmp_path):
    """Vertex properties out of xyz order and a scalar face property before
    the index list must parse correctly in both ascii and binary form."""
    verts = [(1.0, 2.0, 3.0), (4.0, 5.0, 6.0), (7.0, 8.0, 9.0)]
    # ascii: face has a leading scalar 'flags' property
    p = str(tmp_path / "order.ply")
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write("element vertex 3\n")
        f.write("property float z\nproperty float y\nproperty float x\n")
        f.write("element face 1\n")
        f.write("property uchar flags\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[2]} {v[1]} {v[0]}\n")  # written z y x
        f.write("7 3 0 1 2\n")  # flags=7, then the triangle
    got = m.read_triangle_mesh(p)
    assert np.allclose(got.vertices, verts)
    assert np.array_equal(got.faces, [[0, 1, 2]])

    # binary: z/y/x vertex order plus a per-vertex list property to force
    # the generic (non-fixed-stride) element walker
    p2 = str(tmp_path / "order_bin.ply")
    with open(p2, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0",
               "element vertex 3",
               "property float z", "property float y", "property float x",
               "property list uchar float extras",
               "element face 1",
               "property uchar flags",
               "property list uchar int vertex_indices", "end_header"]
        f.write(("\n".join(hdr) + "\n").encode())
        for v in verts:
            f.write(struct.pack("<fff", v[2], v[1], v[0]))
            f.write(struct.pack("<Bff", 2, 0.5, 0.25))  # extras list
        f.write(struct.pack("<B", 7))
        f.write(struct.pack("<B3i", 3, 0, 1, 2))
    got2 = m.read_triangle_mesh(p2)
    assert np.allclose(got2.vertices, verts)
    assert np.array_equal(got2.faces, [[0, 1, 2]])


def test_weld_large_duplicate_cluster():
    """Exact duplicates are deduped before the KD-tree pair query, so a
    vertex repeated k times (triangle-fan soups) cannot blow up into
    O(k^2) pairs; connectivity is still correct."""
    k = 5000
    apex = np.zeros((k, 3))
    rim = np.stack([np.cos(np.linspace(0, 6.28, k)),
                    np.sin(np.linspace(0, 6.28, k)),
                    np.ones(k)], axis=1)
    v = np.concatenate([apex, rim, rim + [0.5, 0, 0]])
    f = np.stack([np.arange(k), k + np.arange(k), 2 * k + np.arange(k)],
                 axis=1).astype(np.int32)
    w = m.weld_vertices(m.TriangleMesh(v, f), 1e-9)
    # all k apex copies merge to one vertex; rim points stay distinct
    assert w.vertices.shape[0] == 1 + 2 * k
    assert (w.faces[:, 0] == w.faces[0, 0]).all()
