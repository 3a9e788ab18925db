"""Minimal GLB (binary glTF 2.0) and PLY mesh IO + surface sampling.

The reference leans on trimesh for every mesh touch (load/dump GLB, apply
transforms, surface sampling, PLY export — e.g. `src/batch_scripts/
whole.py:96-124`, `src/util_3dbox.py:256-270`). trimesh is not in this
image, so this module implements the needed subset natively:

  * GLB read: POSITION + indices (+ COLOR_0 / TEXCOORD_0 + baseColor
    texture when present) from every mesh primitive, node transforms
    applied; textured meshes also get vertex colors sampled from the
    texture so UV-unaware consumers (the registration renderer) keep
    working;
  * GLB write: one triangle mesh with optional vertex colors and an
    optional UV-mapped PNG texture (TEXCOORD_0 + pbrMetallicRoughness
    baseColorTexture — parity with TRELLIS `to_glb`'s textured output,
    `postprocessing_utils.py:399-444`);
  * PLY write: point clouds / triangle meshes (binary little-endian);
  * area-weighted surface sampling (trimesh.sample equivalent) as jnp.

Only the features the pipeline uses — not a general glTF implementation.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field

import numpy as np

_GLB_MAGIC = 0x46546C67
_CHUNK_JSON = 0x4E4F534A
_CHUNK_BIN = 0x004E4942

_COMPONENT_SIZES = {5120: 1, 5121: 1, 5122: 2, 5123: 2, 5125: 4, 5126: 4}
_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16, 5123: np.uint16,
    5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


@dataclass
class Mesh:
    vertices: np.ndarray                       # (V, 3) float32
    faces: np.ndarray                          # (F, 3) int32
    colors: np.ndarray | None = None           # (V, 3|4) uint8 or float
    uv: np.ndarray | None = None               # (V, 2) float32 in [0, 1]
    texture: np.ndarray | None = None          # (H, W, 3) uint8 RGB atlas
    metadata: dict = field(default_factory=dict)

    def apply_transform(self, matrix: np.ndarray) -> "Mesh":
        """4x4 homogeneous transform applied in place; returns self.

        trimesh.apply_transform parity (`whole.py:109-116`).
        """
        m = np.asarray(matrix, np.float64)
        v = self.vertices @ m[:3, :3].T + m[:3, 3]
        self.vertices = v.astype(np.float32)
        return self

    @property
    def is_empty(self) -> bool:
        return self.vertices.size == 0 or self.faces.size == 0

    def face_areas(self) -> np.ndarray:
        tri = self.vertices[self.faces]
        return 0.5 * np.linalg.norm(
            np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1
        )

    @property
    def area(self) -> float:
        return float(self.face_areas().sum())

    def sample(self, count: int, seed: int = 0) -> np.ndarray:
        """Area-weighted surface sampling (trimesh.sample equivalent,
        `util_3dbox.py:269`)."""
        areas = self.face_areas()
        total = areas.sum()
        rng = np.random.default_rng(seed)
        if total <= 0:
            idx = rng.integers(0, len(self.vertices), count)
            return self.vertices[idx].astype(np.float32)
        probs = areas / total
        fidx = rng.choice(len(self.faces), size=count, p=probs)
        tri = self.vertices[self.faces[fidx]]
        u = rng.uniform(size=(count, 1))
        v = rng.uniform(size=(count, 1))
        flip = (u + v) > 1.0
        u = np.where(flip, 1.0 - u, u)
        v = np.where(flip, 1.0 - v, v)
        return (
            tri[:, 0] + u * (tri[:, 1] - tri[:, 0]) + v * (tri[:, 2] - tri[:, 0])
        ).astype(np.float32)


def _node_matrix(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float64).reshape(4, 4).T
    m = np.eye(4)
    if "scale" in node:
        m[:3, :3] = np.diag(node["scale"])
    if "rotation" in node:  # xyzw quaternion
        x, y, z, w = node["rotation"]
        r = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ]
        )
        m[:3, :3] = r @ m[:3, :3]
    if "translation" in node:
        m[:3, 3] = node["translation"]
    return m


def _read_accessor(gltf: dict, binary: bytes, accessor_idx: int) -> np.ndarray:
    acc = gltf["accessors"][accessor_idx]
    view = gltf["bufferViews"][acc["bufferView"]]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    ncomp = _TYPE_COUNTS[acc["type"]]
    offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    count = acc["count"]
    stride = view.get("byteStride")
    itemsize = _COMPONENT_SIZES[acc["componentType"]] * ncomp
    if stride and stride != itemsize:
        rows = []
        for i in range(count):
            start = offset + i * stride
            rows.append(np.frombuffer(binary, dtype, ncomp, start))
        data = np.stack(rows)
    else:
        data = np.frombuffer(binary, dtype, count * ncomp, offset).reshape(count, ncomp)
    return data.copy()


def load_glb(path) -> Mesh:
    """Load the merged triangle geometry of a GLB file."""
    with open(path, "rb") as f:
        raw = f.read()
    magic, _version, _length = struct.unpack_from("<III", raw, 0)
    if magic != _GLB_MAGIC:
        raise ValueError(f"Not a GLB file: {path}")
    offset = 12
    gltf = None
    binary = b""
    while offset < len(raw):
        clen, ctype = struct.unpack_from("<II", raw, offset)
        payload = raw[offset + 8 : offset + 8 + clen]
        if ctype == _CHUNK_JSON:
            gltf = json.loads(payload)
        elif ctype == _CHUNK_BIN:
            binary = payload
        offset += 8 + clen
    if gltf is None:
        raise ValueError("GLB missing JSON chunk")

    def _material_texture(prim) -> np.ndarray | None:
        """Decode the primitive material's baseColor PNG/JPEG, if any."""
        mat_idx = prim.get("material")
        if mat_idx is None:
            return None
        pbr = gltf.get("materials", [])[mat_idx].get("pbrMetallicRoughness", {})
        tex_info = pbr.get("baseColorTexture")
        if tex_info is None:
            return None
        tex = gltf.get("textures", [])[tex_info["index"]]
        img = gltf.get("images", [])[tex["source"]]
        if "bufferView" not in img:
            return None
        view = gltf["bufferViews"][img["bufferView"]]
        start = view.get("byteOffset", 0)
        data = binary[start : start + view["byteLength"]]
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))

    # Walk the default scene's node tree, accumulating transforms.
    # Textures are tracked PER PRIMITIVE (keyed by material index): a
    # multi-material GLB must not sample later primitives' vertex colors
    # from the first primitive's atlas.
    all_v, all_f, all_c, all_uv, all_mat = [], [], [], [], []
    tex_cache: dict[int, np.ndarray | None] = {}
    vcount = 0

    def visit(node_idx: int, parent: np.ndarray):
        nonlocal vcount
        node = gltf["nodes"][node_idx]
        m = parent @ _node_matrix(node)
        if "mesh" in node:
            mesh = gltf["meshes"][node["mesh"]]
            for prim in mesh["primitives"]:
                if "POSITION" not in prim.get("attributes", {}):
                    continue
                pos = _read_accessor(gltf, binary, prim["attributes"]["POSITION"]).astype(np.float64)
                pos = pos @ m[:3, :3].T + m[:3, 3]
                if "indices" in prim:
                    idx = _read_accessor(gltf, binary, prim["indices"]).reshape(-1, 3)
                else:
                    idx = np.arange(len(pos)).reshape(-1, 3)
                colors = None
                if "COLOR_0" in prim["attributes"]:
                    colors = _read_accessor(gltf, binary, prim["attributes"]["COLOR_0"])
                uv = None
                mat_idx = prim.get("material")
                if "TEXCOORD_0" in prim["attributes"]:
                    uv = _read_accessor(gltf, binary, prim["attributes"]["TEXCOORD_0"])
                    if mat_idx is not None and mat_idx not in tex_cache:
                        tex_cache[mat_idx] = _material_texture(prim)
                all_v.append(pos.astype(np.float32))
                all_f.append(idx.astype(np.int64) + vcount)
                all_c.append(colors)
                all_uv.append(uv)
                all_mat.append(mat_idx)
                vcount += len(pos)
        for child in node.get("children", []):
            visit(child, m)

    scene = gltf.get("scenes", [{}])[gltf.get("scene", 0)]
    roots = scene.get("nodes", list(range(len(gltf.get("nodes", [])))))
    for r in roots:
        visit(r, np.eye(4))

    if not all_v:
        return Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
    colors = None
    if all(c is not None for c in all_c) and all_c:
        colors = np.concatenate(all_c, axis=0)
    uv = None
    if all(u is not None for u in all_uv) and all_uv:
        uv = np.concatenate(all_uv, axis=0).astype(np.float32)
    # The merged (uv, texture) pair is only meaningful when every textured
    # primitive references the SAME atlas; otherwise drop it and rely on
    # per-primitive sampled vertex colors below.
    tex_mats = {m for m, u in zip(all_mat, all_uv)
                if u is not None and tex_cache.get(m) is not None}
    texture = tex_cache[next(iter(tex_mats))] if len(tex_mats) == 1 else None
    if texture is not None and uv is None:
        texture = None

    def _sample(tex, puv):
        th, tw = tex.shape[:2]
        ui = np.clip((puv[:, 0] % 1.0) * (tw - 1), 0, tw - 1).astype(np.int64)
        vi = np.clip((puv[:, 1] % 1.0) * (th - 1), 0, th - 1).astype(np.int64)
        return tex[vi, ui].astype(np.float32) / 255.0

    if colors is None and tex_mats:
        # Sample vertex colors PER PRIMITIVE from its own texture so
        # UV-unaware consumers (the registration renderer's vertex
        # shading) keep appearance even across materials. Primitives
        # without a texture fall back to mid-gray.
        per_prim = []
        ok = True
        for pv, pc, puv, pm in zip(all_v, all_c, all_uv, all_mat):
            if pc is not None:
                per_prim.append(np.asarray(pc, np.float32)[:, :3])
            elif puv is not None and tex_cache.get(pm) is not None:
                per_prim.append(_sample(tex_cache[pm], puv))
            elif len(tex_mats) > 1:
                per_prim.append(np.full((len(pv), 3), 0.5, np.float32))
            else:
                ok = False
                break
        if ok:
            colors = np.concatenate(per_prim, axis=0)
    return Mesh(
        vertices=np.concatenate(all_v, axis=0),
        faces=np.concatenate(all_f, axis=0).astype(np.int32),
        colors=colors,
        uv=uv,
        texture=texture,
    )


def save_glb(path, mesh: Mesh) -> None:
    """Write one triangle mesh as a GLB (positions, indices, optional
    vertex colors, optional TEXCOORD_0 + embedded PNG baseColor texture)."""
    v = np.ascontiguousarray(mesh.vertices, np.float32)
    f = np.ascontiguousarray(mesh.faces, np.uint32).reshape(-1, 3)
    buffers = [v.tobytes(), f.tobytes()]
    views = [
        {"buffer": 0, "byteOffset": 0, "byteLength": len(buffers[0]), "target": 34962},
        {"buffer": 0, "byteOffset": len(buffers[0]), "byteLength": len(buffers[1]), "target": 34963},
    ]
    accessors = [
        {
            "bufferView": 0, "componentType": 5126, "count": len(v), "type": "VEC3",
            "min": v.min(axis=0).tolist() if len(v) else [0, 0, 0],
            "max": v.max(axis=0).tolist() if len(v) else [0, 0, 0],
        },
        {"bufferView": 1, "componentType": 5125, "count": f.size, "type": "SCALAR"},
    ]
    attributes = {"POSITION": 0}
    if mesh.colors is not None:
        c = np.ascontiguousarray(mesh.colors, np.float32)
        if c.shape[1] == 3:
            ctype = "VEC3"
        else:
            ctype = "VEC4"
        off = sum(len(b) for b in buffers)
        buffers.append(c.tobytes())
        views.append({"buffer": 0, "byteOffset": off, "byteLength": len(buffers[-1]), "target": 34962})
        accessors.append({"bufferView": len(views) - 1, "componentType": 5126, "count": len(c), "type": ctype})
        attributes["COLOR_0"] = len(accessors) - 1

    gltf_extra: dict = {}
    primitive: dict = {"attributes": attributes, "indices": 1, "mode": 4}
    if mesh.uv is not None and mesh.texture is not None:
        import io

        from PIL import Image

        uv = np.ascontiguousarray(mesh.uv, np.float32).reshape(-1, 2)
        assert len(uv) == len(v), "uv must be per-vertex"
        off = sum(len(b) for b in buffers)
        buffers.append(uv.tobytes())
        views.append({"buffer": 0, "byteOffset": off,
                      "byteLength": len(buffers[-1]), "target": 34962})
        accessors.append({"bufferView": len(views) - 1, "componentType": 5126,
                          "count": len(uv), "type": "VEC2"})
        attributes["TEXCOORD_0"] = len(accessors) - 1

        png = io.BytesIO()
        Image.fromarray(np.asarray(mesh.texture, np.uint8)).save(png, format="PNG")
        png_bytes = png.getvalue()
        off = sum(len(b) for b in buffers)
        pad = (-off) % 4  # image bufferView must be 4-aligned
        if pad:
            buffers.append(b"\x00" * pad)
            off += pad
        buffers.append(png_bytes)
        views.append({"buffer": 0, "byteOffset": off, "byteLength": len(png_bytes)})
        gltf_extra = {
            "images": [{"bufferView": len(views) - 1, "mimeType": "image/png"}],
            "samplers": [{"magFilter": 9729, "minFilter": 9729,
                          "wrapS": 10497, "wrapT": 10497}],
            "textures": [{"sampler": 0, "source": 0}],
            "materials": [{
                "pbrMetallicRoughness": {
                    "baseColorTexture": {"index": 0, "texCoord": 0},
                    "metallicFactor": 0.0,
                    "roughnessFactor": 1.0,
                },
                "doubleSided": True,
            }],
        }
        primitive["material"] = 0

    bin_blob = b"".join(buffers)
    pad_bin = (-len(bin_blob)) % 4
    bin_blob += b"\x00" * pad_bin

    gltf = {
        "asset": {"version": "2.0", "generator": "labelany3d_tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [primitive]}],
        "buffers": [{"byteLength": len(bin_blob)}],
        "bufferViews": views,
        "accessors": accessors,
        **gltf_extra,
    }
    js = json.dumps(gltf).encode()
    js += b" " * ((-len(js)) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_blob)
    with open(path, "wb") as fh:
        fh.write(struct.pack("<III", _GLB_MAGIC, 2, total))
        fh.write(struct.pack("<II", len(js), _CHUNK_JSON))
        fh.write(js)
        fh.write(struct.pack("<II", len(bin_blob), _CHUNK_BIN))
        fh.write(bin_blob)


def save_ply_points(path, points: np.ndarray, colors: np.ndarray | None = None) -> None:
    """Binary little-endian PLY point cloud (depth_scene.ply parity,
    `src/batch_scripts/depth.py:157`)."""
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    n = len(pts)
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if colors is not None:
        colors = np.asarray(colors).reshape(-1, 3)
        if colors.dtype != np.uint8:
            colors = np.clip(colors, 0, 255).astype(np.uint8)
        header += ["property uchar red", "property uchar green", "property uchar blue"]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if colors is None:
            f.write(pts.tobytes())
        else:
            rec = np.zeros(n, dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
            rec["xyz"] = pts
            rec["rgb"] = colors
            f.write(rec.tobytes())


def save_ply_mesh(path, vertices: np.ndarray, faces: np.ndarray,
                  colors: np.ndarray | None = None) -> None:
    """Binary-LE PLY triangle mesh (depth_scene_no_edge.ply parity,
    `src/batch_scripts/depth.py:49`)."""
    v = np.asarray(vertices, np.float32).reshape(-1, 3)
    f = np.asarray(faces, np.int32).reshape(-1, 3)
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {len(v)}",
              "property float x", "property float y", "property float z"]
    if colors is not None:
        colors = np.asarray(colors).reshape(-1, 3)
        if colors.dtype != np.uint8:
            colors = np.clip(colors, 0, 255).astype(np.uint8)
        header += ["property uchar red", "property uchar green", "property uchar blue"]
    header += [f"element face {len(f)}", "property list uchar int vertex_indices",
               "end_header"]
    with open(path, "wb") as fh:
        fh.write(("\n".join(header) + "\n").encode())
        if colors is None:
            fh.write(v.tobytes())
        else:
            rec = np.zeros(len(v), dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
            rec["xyz"] = v
            rec["rgb"] = colors
            fh.write(rec.tobytes())
        frec = np.zeros(len(f), dtype=[("n", np.uint8), ("idx", np.int32, 3)])
        frec["n"] = 3
        frec["idx"] = f
        fh.write(frec.tobytes())


def load_ply_points(path) -> tuple[np.ndarray, np.ndarray | None]:
    """Read a binary-LE PLY written by `save_ply_points`."""
    with open(path, "rb") as f:
        raw = f.read()
    end = raw.index(b"end_header\n") + len(b"end_header\n")
    header = raw[:end].decode().splitlines()
    n = 0
    has_color = False
    for line in header:
        if line.startswith("element vertex"):
            n = int(line.split()[-1])
        if line.startswith("property uchar red"):
            has_color = True
    body = raw[end:]
    if has_color:
        rec = np.frombuffer(body, dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)], count=n)
        return rec["xyz"].copy(), rec["rgb"].copy()
    pts = np.frombuffer(body, np.float32, n * 3).reshape(n, 3)
    return pts.copy(), None
