"""Builtin scene factory shared by the CLI (``--scene``) and the viewer's
runtime loader (``/api/load`` with a builtin name)."""

from __future__ import annotations

BUILTIN_SCENES = ("default", "sphere", "chessboard", "flagship")


def builtin_scene(name: str):
    """Construct one of the named builtin scenes -> (scene, library).

    ``default`` = the reference's editor default scene (2 cubes + floor +
    red spotlight, ``editor.cpp:507-568``); ``chessboard`` = the textured
    showcase board; ``flagship`` = the lathed-chess ABeautifulGame
    stand-in; ``sphere`` = a single 5x-scaled UV sphere."""
    if name == "default":
        from syzygy_tpu.scene import default_scene

        return default_scene()
    if name == "chessboard":
        from syzygy_tpu.assets.showcase import chessboard_scene

        return chessboard_scene()
    if name == "flagship":
        from syzygy_tpu.assets.chess import flagship_scene

        return flagship_scene()
    if name == "sphere":
        from syzygy_tpu.assets import (
            TextureLibrary,
            register_default_textures,
            sphere_mesh,
        )
        from syzygy_tpu.scene import Scene, TransformHost

        library = TextureLibrary()
        material = register_default_textures(library)
        scene = Scene()
        scene.add_mesh_instance(
            sphere_mesh(material),
            "Sphere",
            [TransformHost.make((0.0, -8.0, 0.0), scale=(5.0, 5.0, 5.0))],
        )
        return scene, library
    raise KeyError(f"no builtin scene named {name!r}")
