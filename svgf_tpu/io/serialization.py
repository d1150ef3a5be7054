"""Scene + temporal-state (de)serialization.

The reference checkpoints only the scene (custom binary, Scene.cpp:515-651)
and never the filter history. Here:
  * scenes round-trip through npz (the idiomatic flat-array form);
  * TemporalState checkpoints (colour/moments/history/TAA/G-buffer + frame
    index) make orbit sequences resumable deterministically (SURVEY.md §5
    checkpoint/resume).
"""

from __future__ import annotations

import numpy as np

from svgf_tpu.core.camera import Camera
from svgf_tpu.core.scene import Environment, Instance, Material, MaterialType, Scene, Shape
from svgf_tpu.render.types import GBuffer, TemporalState


def save_scene_npz(path: str, scene: Scene) -> None:
    data: dict = {}
    data["n_shapes"] = len(scene.shapes)
    data["n_instances"] = len(scene.instances)
    data["n_materials"] = len(scene.materials)
    data["n_cameras"] = len(scene.cameras)
    data["n_envs"] = len(scene.environments)
    data["n_envtex"] = len(scene.env_textures)
    for i, s in enumerate(scene.shapes):
        data[f"shape{i}_pos"] = np.asarray(s.positions, np.float32)
        data[f"shape{i}_idx"] = np.asarray(s.indices, np.int32)
        if s.normals is not None:
            data[f"shape{i}_nrm"] = np.asarray(s.normals, np.float32)
        if s.uvs is not None:
            data[f"shape{i}_uv"] = np.asarray(s.uvs, np.float32)
        data[f"shape{i}_name"] = np.bytes_(s.name.encode())
    for i, inst in enumerate(scene.instances):
        data[f"inst{i}"] = np.asarray(inst.transform, np.float32)
        data[f"inst{i}_ids"] = np.asarray([inst.shape, inst.material], np.int32)
        data[f"inst{i}_name"] = np.bytes_(inst.name.encode())
    for i, m in enumerate(scene.materials):
        data[f"mat{i}"] = np.asarray(
            list(m.emission) + list(m.colour)
            + [m.roughness, m.metallic, m.anisotropy, float(m.material_type),
               m.opacity, m.transmission_depth]
            + list(m.scattering_colour),
            np.float32,
        )
        data[f"mat{i}_tex"] = np.asarray(
            [m.emission_texture, m.colour_texture, m.roughness_texture,
             m.normal_texture], np.int32,
        )
    data["n_textures"] = len(scene.textures)
    data["textures_enabled"] = bool(scene.textures_enabled)
    for i, t in enumerate(scene.textures):
        data[f"tex{i}"] = np.asarray(t)
    for i, c in enumerate(scene.cameras):
        data[f"cam{i}_frame"] = c.frame
        data[f"cam{i}_prev"] = c.previous_frame
        data[f"cam{i}_meta"] = np.asarray([c.fov, c.aspect], np.float32)
    for i, e in enumerate(scene.environments):
        data[f"env{i}_t"] = np.asarray(e.transform, np.float32)
        data[f"env{i}_meta"] = np.asarray(
            list(e.emission) + [float(e.emission_texture)], np.float32
        )
    for i, t in enumerate(scene.env_textures):
        data[f"envtex{i}"] = np.asarray(t, np.float32)
    np.savez_compressed(path, **data)


def load_scene_npz(path: str) -> Scene:
    z = np.load(path, allow_pickle=False)
    scene = Scene()
    for i in range(int(z["n_shapes"])):
        scene.shapes.append(
            Shape(
                positions=z[f"shape{i}_pos"],
                indices=z[f"shape{i}_idx"],
                normals=z[f"shape{i}_nrm"] if f"shape{i}_nrm" in z else None,
                uvs=z[f"shape{i}_uv"] if f"shape{i}_uv" in z else None,
                name=bytes(z[f"shape{i}_name"]).decode(),
            )
        )
    for i in range(int(z["n_instances"])):
        ids = z[f"inst{i}_ids"]
        scene.instances.append(
            Instance(
                shape=int(ids[0]), material=int(ids[1]),
                transform=z[f"inst{i}"],
                name=bytes(z[f"inst{i}_name"]).decode(),
            )
        )
    for i in range(int(z["n_materials"])):
        v = z[f"mat{i}"]
        tex = z[f"mat{i}_tex"] if f"mat{i}_tex" in z else np.full(4, -1, np.int32)
        scene.materials.append(
            Material(
                emission=tuple(v[0:3]), colour=tuple(v[3:6]),
                roughness=float(v[6]), metallic=float(v[7]), anisotropy=float(v[8]),
                material_type=MaterialType(int(v[9])), opacity=float(v[10]),
                transmission_depth=float(v[11]), scattering_colour=tuple(v[12:15]),
                emission_texture=int(tex[0]), colour_texture=int(tex[1]),
                roughness_texture=int(tex[2]), normal_texture=int(tex[3]),
            )
        )
    for i in range(int(z["n_cameras"])):
        meta = z[f"cam{i}_meta"]
        scene.cameras.append(
            Camera(
                frame=z[f"cam{i}_frame"], previous_frame=z[f"cam{i}_prev"],
                fov=float(meta[0]), aspect=float(meta[1]),
            )
        )
    for i in range(int(z["n_envs"])):
        meta = z[f"env{i}_meta"]
        scene.environments.append(
            Environment(
                transform=z[f"env{i}_t"], emission=tuple(meta[0:3]),
                emission_texture=int(meta[3]),
            )
        )
    for i in range(int(z["n_envtex"])):
        scene.env_textures.append(z[f"envtex{i}"])
    if "n_textures" in z:
        for i in range(int(z["n_textures"])):
            scene.textures.append(z[f"tex{i}"])
        scene.textures_enabled = bool(z["textures_enabled"])
    return scene


# ---------------------------------------------------------------------------
# temporal-state checkpoints
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state: TemporalState,
                    height: int | None = None, width: int | None = None) -> None:
    """Checkpoint a TemporalState. Planar-path states (legacy image fields
    None, kernels.planar layout) are converted to the legacy image layout on
    the host so checkpoints stay mode-agnostic — a planar checkpoint resumes
    under the XLA path and vice versa. For planar states pass height/width
    (the padded planes don't encode them)."""
    if state.color is None:
        assert state.planar is not None, "empty state"
        assert height is not None and width is not None, (
            "planar checkpoints need height/width"
        )
        from svgf_tpu.kernels.planar import N_PREV_PACKED, PAD_X, PAD_Y
        from svgf_tpu.render.types import GBuffer as GB

        prev = np.asarray(state.planar.prev)[
            :, PAD_Y : PAD_Y + height, PAD_X : PAD_X + width
        ]
        if prev.shape[0] == N_PREV_PACKED:
            # fp16 pair-packed form: split each f32 plane into its two
            # fp16 halves (little-endian; kernels.planar._PAIRS order)
            u = prev.astype(np.float32).view(np.uint32)
            lo16 = (u & 0xFFFF).astype(np.uint16).view(np.float16)
            hi16 = (u >> 16).astype(np.uint16).view(np.float16)
            prev = np.stack(
                [lo16[0], hi16[0], lo16[1], hi16[1], lo16[2],
                 lo16[3], hi16[3], lo16[4], hi16[2], hi16[4], lo16[5]],
                axis=0,
            ).astype(np.float32)
        prev = prev.astype(np.float32)
        taa = np.asarray(state.planar.taa)[
            :, PAD_Y : PAD_Y + height, PAD_X : PAD_X + width
        ]
        if taa.shape[0] == 2:   # fp16 pair-packed ([r|g], [b|a])
            u = taa.astype(np.float32).view(np.uint32)
            lo16 = (u & 0xFFFF).astype(np.uint16).view(np.float16)
            hi16 = (u >> 16).astype(np.uint16).view(np.float16)
            taa = np.stack([lo16[0], hi16[0], lo16[1], hi16[1]], axis=0)
        taa = taa.astype(np.float32)
        color = np.concatenate(
            [np.moveaxis(prev[5:8], 0, -1), np.zeros((height, width, 1), np.float32)],
            axis=-1,
        )
        g = GB.zeros(height, width)._replace(
            depth=prev[0], instance=prev[1].astype(np.int32),
            normal=np.moveaxis(prev[2:5], 0, -1),
        )
        state = state._replace(
            color=color,
            moments=np.moveaxis(prev[9:11], 0, -1),
            history_len=prev[8].astype(np.int32),
            taa_history=np.moveaxis(taa, 0, -1),
            gbuffer=g,
        )
    g = state.gbuffer
    np.savez_compressed(
        path,
        color=np.asarray(state.color), moments=np.asarray(state.moments),
        history_len=np.asarray(state.history_len),
        taa_history=np.asarray(state.taa_history),
        frame_idx=np.asarray(state.frame_idx),
        **{f"g_{k}": np.asarray(v) for k, v in g._asdict().items()},
    )


def load_checkpoint(path: str, dtype=None) -> TemporalState:
    import jax.numpy as jnp

    z = np.load(path)
    cast = (lambda x: jnp.asarray(x, dtype)) if dtype else jnp.asarray
    gb = GBuffer(
        **{
            k: (cast(z[f"g_{k}"]) if np.issubdtype(z[f"g_{k}"].dtype, np.floating)
                else jnp.asarray(z[f"g_{k}"]))
            for k in GBuffer._fields
        }
    )
    return TemporalState(
        color=cast(z["color"]), moments=cast(z["moments"]),
        history_len=jnp.asarray(z["history_len"]),
        taa_history=cast(z["taa_history"]),
        gbuffer=gb, frame_idx=jnp.asarray(z["frame_idx"]),
    )
