"""Asset dispatch by extension (reference AssetLoader.cpp:11-56)."""

from __future__ import annotations

import numpy as np

from svgf_tpu.core.scene import Instance, Scene


def load_asset(path: str, scene: Scene, material: int = 0,
               transform: np.ndarray | None = None) -> Scene:
    """Load a model file into `scene`, adding shapes + instances.

    glTF files carry their own materials/instances; OBJ adds one instance
    bound to `material` with `transform`.
    """
    low = path.lower()
    if low.endswith((".gltf", ".glb")):
        from svgf_tpu.io.gltf import load_gltf

        return load_gltf(path, scene)
    if low.endswith(".obj"):
        from svgf_tpu.io.objloader import load_obj

        shape = load_obj(path)
        scene.shapes.append(shape)
        scene.instances.append(
            Instance(
                shape=len(scene.shapes) - 1,
                material=material,
                transform=transform if transform is not None else np.eye(4, dtype=np.float32),
                name=shape.name,
            )
        )
        return scene
    if low.endswith((".bin", ".scene")) or "/Scenes/" in path or low.endswith("basescene"):
        from svgf_tpu.io.binscene import load_reference_scene

        loaded = load_reference_scene(path)
        if not scene.shapes and not scene.instances:
            return loaded
        raise ValueError("binary scenes can only be loaded into an empty scene")
    raise ValueError(f"unsupported asset type: {path}")
