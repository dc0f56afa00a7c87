"""Generate the checked-in adversarial multi-file fixture
(`adv_multi_a.glb` + `adv_multi_b.gltf`) — VERDICT r4 #8.

One scene split over TWO files, combining in a single load every loader
quirk the one-quirk-at-a-time unit tests cover separately:

File A (binary .glb, hand-built JSON — no GLTFBuilder, so the byte
layout is under test control):
- INTERLEAVED vertex attributes: one bufferView, byteStride 32
  (pos 3f @0, normal 3f @12, uv 2f @24) — ModelLoader copies through
  cgltf's strided accessor reads; our parser must honor byteStride.
- a SPARSE accessor on POSITION: base values from the interleaved view,
  vertex 3 overridden to (2, 2, 0.5) via sparse indices/values.
- u8 indices (index widening to u32, ModelLoader.cpp:753-781).
- TWO primitives sharing the same accessors with different materials:
  accessor de-duplication must give both geometries the same
  vertex_offset (ModelLoader.cpp:591-634).
- material 1 = alpha-MASK (cutoff 0.4) with a DECLARED sampler asking
  for magFilter LINEAR — which the reference never assigns
  (ModelLoader.cpp:990-1001), so the effective filter is NEAREST.
- a node with translation + non-uniform scale and NO rotation: the
  flattened transform must use the reference identity quaternion
  (glm::quat(0,0,0,1) = 180 deg about Z, ModelLoader.cpp:492-522).

File B (.gltf with embedded base64 buffers):
- a BLEND-mode material whose cutoff must become 0.9
  (ModelLoader.cpp:877) and whose albedo texture declares NO sampler —
  the fallback sampler is LINEAR (ModelLoader.cpp:119-125), the
  documented any-hit filter deviation (docs/ARCHITECTURE.md).
- u16 indices; separate (non-interleaved) accessors.
- loaded SECOND, so its local material/texture/image index 0 must be
  offset by file A's counts (ModelLoader.cpp:132-161).

Run from the repo root to (re)generate:
    python tests/fixtures/gen_adversarial.py
tests/test_adversarial_asset.py holds the independently-derived
expected arrays.
"""

import base64
import io
import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

HERE = os.path.dirname(os.path.abspath(__file__))


def png_bytes(img):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img, "RGBA").save(buf, format="PNG")
    return buf.getvalue()


def checker_rgba(n=4):
    img = np.zeros((n, n, 4), np.uint8)
    yy, xx = np.mgrid[0:n, 0:n]
    img[..., 0] = 200
    img[..., 1] = 120
    img[..., 2] = 40
    img[..., 3] = np.where(((xx + yy) % 2).astype(bool), 255, 0)
    return img


def gradient_rgba(n=8):
    img = np.zeros((n, n, 4), np.uint8)
    img[..., 0] = 90
    img[..., 1] = 200
    img[..., 2] = 90
    img[..., 3] = (np.linspace(0, 255, n)[None, :]
                   * np.ones((n, 1))).astype(np.uint8)
    return img


# ---- file A: interleaved + sparse + u8 indices + shared accessors -----

# 4 vertices x (pos 3f, normal 3f, uv 2f), stride 32
A_POS = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
A_NRM = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
A_UV = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
A_SPARSE_INDEX = 3
A_SPARSE_POS = np.array([2.0, 2.0, 0.5], np.float32)
A_INDICES_U8 = np.array([0, 1, 2, 2, 1, 3], np.uint8)
A_NODE_T = [1.0, 2.0, 3.0]
A_NODE_S = [1.0, 2.0, 1.0]
A_MASK_CUTOFF = 0.4


def build_a(path):
    interleaved = np.zeros((4, 8), np.float32)
    interleaved[:, 0:3] = A_POS
    interleaved[:, 3:6] = A_NRM
    interleaved[:, 6:8] = A_UV
    vtx = interleaved.tobytes()                       # 128 B, stride 32

    idx = A_INDICES_U8.tobytes()                      # 6 B
    sp_idx = np.array([A_SPARSE_INDEX], np.uint16).tobytes()   # 2 B
    sp_val = A_SPARSE_POS.tobytes()                   # 12 B
    png = png_bytes(checker_rgba())

    def pad4(b, fill=b"\x00"):
        return b + fill * (-len(b) % 4)

    off = {}
    bin_parts = []
    cur = 0
    for name, blob in (("vtx", vtx), ("idx", idx), ("spi", sp_idx),
                       ("spv", sp_val), ("png", png)):
        blob = pad4(blob)
        off[name] = (cur, len(blob))
        bin_parts.append(blob)
        cur += len(blob)
    bin_chunk = b"".join(bin_parts)

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": A_NODE_T, "scale": A_NODE_S}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
             "indices": 3, "material": 0},
            {"attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
             "indices": 3, "material": 1},
        ]}],
        "buffers": [{"byteLength": len(bin_chunk)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": off["vtx"][0], "byteLength": 128,
             "byteStride": 32, "target": 34962},
            {"buffer": 0, "byteOffset": off["idx"][0], "byteLength": 6,
             "target": 34963},
            {"buffer": 0, "byteOffset": off["spi"][0], "byteLength": 2},
            {"buffer": 0, "byteOffset": off["spv"][0], "byteLength": 12},
            {"buffer": 0, "byteOffset": off["png"][0],
             "byteLength": len(png)},
        ],
        "accessors": [
            # POSITION: interleaved base + sparse override of vertex 3
            {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
             "count": 4, "type": "VEC3",
             "min": [0.0, 0.0, 0.0], "max": [2.0, 2.0, 0.5],
             "sparse": {
                 "count": 1,
                 "indices": {"bufferView": 2, "byteOffset": 0,
                             "componentType": 5123},
                 "values": {"bufferView": 3, "byteOffset": 0}}},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
             "count": 4, "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 24, "componentType": 5126,
             "count": 4, "type": "VEC2"},
            {"bufferView": 1, "byteOffset": 0, "componentType": 5121,
             "count": 6, "type": "SCALAR"},
        ],
        "materials": [
            {"pbrMetallicRoughness": {
                "baseColorFactor": [0.8, 0.2, 0.2, 1.0],
                "metallicFactor": 0.0, "roughnessFactor": 0.8}},
            {"alphaMode": "MASK", "alphaCutoff": A_MASK_CUTOFF,
             "pbrMetallicRoughness": {
                 "baseColorFactor": [1.0, 1.0, 1.0, 1.0],
                 "baseColorTexture": {"index": 0}}},
        ],
        # declared sampler ASKS for LINEAR magFilter; the reference never
        # assigns magFilter (ModelLoader.cpp:990-1001) => NEAREST
        "samplers": [{"magFilter": 9729, "minFilter": 9729,
                      "wrapS": 33071, "wrapT": 10497}],
        "textures": [{"source": 0, "sampler": 0}],
        "images": [{"bufferView": 4, "mimeType": "image/png"}],
    }

    js = pad4(json.dumps(doc, separators=(",", ":")).encode(), b" ")
    total = 12 + 8 + len(js) + 8 + len(bin_chunk)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))  # JSON
        f.write(js)
        f.write(struct.pack("<II", len(bin_chunk), 0x004E4942))  # BIN
        f.write(bin_chunk)


# ---- file B: blend material + fallback sampler + u16 indices ----------

B_POS = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0], [2, 2, 0]], np.float32)
B_UV = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
B_INDICES_U16 = np.array([0, 1, 2, 2, 1, 3], np.uint16)
B_NODE_T = [-1.0, 0.5, 0.0]
# 45 deg about +Z in glTF (x, y, z, w) order
B_NODE_R = [0.0, 0.0, 0.3826834323650898, 0.9238795325112867]


def build_b(path):
    def uri(arr_bytes):
        return ("data:application/octet-stream;base64,"
                + base64.b64encode(arr_bytes).decode())

    pos = B_POS.tobytes()
    uv = B_UV.tobytes()
    idx = B_INDICES_U16.tobytes()
    png = png_bytes(gradient_rgba())

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": B_NODE_T, "rotation": B_NODE_R}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0, "TEXCOORD_0": 1},
             "indices": 2, "material": 0}]}],
        "buffers": [
            {"byteLength": len(pos), "uri": uri(pos)},
            {"byteLength": len(uv), "uri": uri(uv)},
            {"byteLength": len(idx), "uri": uri(idx)},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos)},
            {"buffer": 1, "byteOffset": 0, "byteLength": len(uv)},
            {"buffer": 2, "byteOffset": 0, "byteLength": len(idx)},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3", "min": [0, 0, 0], "max": [2, 2, 0]},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "materials": [
            # BLEND => cutoff forced to 0.9 (ModelLoader.cpp:877); the
            # declared alphaCutoff must be IGNORED
            {"alphaMode": "BLEND", "alphaCutoff": 0.123,
             "pbrMetallicRoughness": {
                 "baseColorFactor": [1.0, 1.0, 1.0, 0.9],
                 "baseColorTexture": {"index": 0}}},
        ],
        # texture with NO sampler => fallback LINEAR + REPEAT
        "textures": [{"source": 0}],
        "images": [{"uri": "data:image/png;base64,"
                    + base64.b64encode(png).decode()}],
    }
    with open(path, "w") as f:
        json.dump(doc, f, separators=(",", ":"))


if __name__ == "__main__":
    build_a(os.path.join(HERE, "adv_multi_a.glb"))
    build_b(os.path.join(HERE, "adv_multi_b.gltf"))
    print("wrote adv_multi_a.glb + adv_multi_b.gltf")
