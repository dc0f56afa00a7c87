"""Generate the checked-in `lamp.glb` / `lamp.gltf` fixture.

A small hand-built multi-node asset exercising the loader quirks that the
procedural scenes never hit together on one real file:

- a 3-deep node hierarchy with rotations at depth 0 and 2 but NOT at
  depth 1 (the reference's component-wise TRS drops the parent rotation
  for unrotated children, ModelLoader.cpp:501-522);
- quaternion rotations fed through the shifted glm::quat(w=x,x=y,y=z,z=w)
  constructor (ModelLoader.cpp:520-521);
- non-uniform scales that accumulate component-wise;
- uint8 indices (widening), a uint16-indexed quad, and a box mesh;
- OPAQUE metallic, emissive, and alpha-MASK-textured materials;
- a rotated perspective camera node.

Run from the repo root to (re)generate:  python tests/fixtures/gen_lamp.py
The .glb (binary container) and .gltf (embedded-base64) forms carry the
same scene; tests/test_fixture_asset.py asserts they load identically and
match independently computed world-space geometry.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tpurt.scene.procedural import GLTFBuilder, _box_mesh, _quad_mesh  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))

# 90 deg about +Y and 45 deg about +Z, in glTF (x, y, z, w) storage order
ROT_Y90 = [0.0, 0.7071067811865476, 0.0, 0.7071067811865476]
ROT_Z45 = [0.0, 0.0, 0.3826834323650898, 0.9238795325112867]


def leaf_texture(n=8):
    """RGBA checker with alternating opaque/transparent cells."""
    img = np.zeros((n, n, 4), np.uint8)
    yy, xx = np.mgrid[0:n, 0:n]
    checker = ((xx // 2 + yy // 2) % 2).astype(bool)
    img[..., 0] = 40
    img[..., 1] = 180
    img[..., 2] = 60
    img[..., 3] = np.where(checker, 255, 0)
    return img


def build():
    b = GLTFBuilder()

    m_metal = b.add_material(base_color=(0.7, 0.7, 0.75, 1.0),
                             metallic=0.9, roughness=0.3)
    m_emissive = b.add_material(base_color=(1.0, 0.9, 0.6, 1.0),
                                emissive=(2.0, 1.0, 0.5))
    tex = b.add_texture(leaf_texture(),
                        sampler={"wrapS": 10497, "wrapT": 10497})
    m_leaf = b.add_material(base_color=(1, 1, 1, 1), alpha_mode="MASK",
                            alpha_cutoff=0.5, base_color_texture=tex)

    # base: box, uint16 indices
    p, n, uv, idx = _box_mesh(size=0.5)
    mesh_base = b.add_mesh(p, n, uv, idx.astype(np.uint16), material=m_metal)

    # arm: a single triangle with uint8 indices (index widening path)
    tri_p = np.array([[0, 0, 0], [0.4, 0, 0], [0, 0.8, 0]], np.float32)
    tri_n = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
    tri_uv = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    mesh_arm = b.add_mesh(tri_p, tri_n, tri_uv,
                          np.array([0, 1, 2], np.uint8), material=m_emissive)

    # head + floor: quads
    qp, qn, quv, qidx = _quad_mesh()
    mesh_head = b.add_mesh(qp, qn, quv, qidx.astype(np.uint16),
                           material=m_leaf)
    mesh_floor = b.add_mesh(qp * 4.0, qn, quv, qidx.astype(np.uint16),
                            material=m_metal)

    # hierarchy: base (T+R+S) -> arm (T+S, NO rotation) -> head (T+R)
    n_head = b.add_node(mesh=mesh_head, translation=[0.25, 0.0, 0.0],
                        rotation=ROT_Z45, root=False)
    n_arm = b.add_node(mesh=mesh_arm, translation=[0.0, 1.5, 0.0],
                       scale=[0.5, 0.5, 0.5], children=[n_head], root=False)
    b.add_node(mesh=mesh_base, translation=[1.0, 2.0, -3.0],
               rotation=ROT_Y90, scale=[2.0, 1.0, 1.0], children=[n_arm])
    b.add_node(mesh=mesh_floor)  # no TRS at all
    cam = b.add_camera(yfov=0.9, znear=0.05, zfar=100.0)
    b.add_node(camera=cam, translation=[0.0, -1.0, 4.0],
               rotation=[0.0, 0.0, 0.0, 1.0])  # explicit glTF identity

    return b


if __name__ == "__main__":
    b = build()
    print(b.write(os.path.join(HERE, "lamp.gltf")))
    print(b.write_glb(os.path.join(HERE, "lamp.glb")))
