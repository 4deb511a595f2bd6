"""Reflection-driven property table (the headless PropertyTable analog).

The reference edits everything live through 3-column name/value/reset tables
(``ui/propertytable.hpp:28-226``) with defaults from ``Scene``'s static
members (``renderer/scene.cpp:52-91``) and transforms resetting to spawn
values. These tests pin the discovery, set, and reset semantics.
"""

import numpy as np
import pytest

from syzygy_tpu.app.properties import (
    apply_set,
    discover,
    format_table,
    get_path,
    reset_path,
    set_path,
)
from syzygy_tpu.scene import default_scene
from syzygy_tpu.scene.scene import InstanceAnimation


@pytest.fixture()
def scene():
    s, _ = default_scene()
    return s


def test_discovery_covers_reference_property_groups(scene):
    """Every group the reference's scene-controls window edits
    (statelesswidgets.cpp:752-833) appears: sun animation, atmosphere,
    camera, spotlights, instance flags + transforms."""
    paths = {p.path for p in discover(scene)}
    assert "sun_animation.time" in paths
    assert "sun_animation.skip_night" in paths
    assert "atmosphere.sun_euler_angles" in paths
    assert "atmosphere.scattering_rayleigh_per_mm" in paths
    assert "cameras[0].fov_degrees" in paths
    assert "camera_speed" in paths
    assert "spotlights[0].strength" in paths
    assert "geometry[0].render" in paths
    assert any(".transforms[0].translation" in p for p in paths)


def test_defaults_match_reference_constants(scene):
    """Reset defaults are the reference's static defaults
    (scene.cpp:52-91): camera fov 70, speed 20, sun time 0.5."""
    by_path = {p.path: p for p in discover(scene)}
    assert by_path["cameras[0].fov_degrees"].default == 70.0
    assert by_path["camera_speed"].default == 20.0
    assert by_path["sun_animation.time"].default == 0.5
    assert by_path["atmosphere.planet_radius_mm"].default == 6.360


def test_set_and_reset_scalar(scene):
    set_path(scene, "cameras[0].fov_degrees", 90)
    assert scene.camera.fov_degrees == 90.0
    reset_path(scene, "cameras[0].fov_degrees")
    assert scene.camera.fov_degrees == 70.0


def test_set_tuple_coercion(scene):
    set_path(scene, "atmosphere.sun_euler_angles", [1.2, 0, 0.5])
    assert scene.atmosphere.sun_euler_angles == (1.2, 0.0, 0.5)
    with pytest.raises(ValueError):
        set_path(scene, "atmosphere.sun_euler_angles", [1.0, 2.0])


def test_set_enum_by_name(scene):
    set_path(scene, "geometry[0].animation", "SPIN_ALONG_WORLD_UP")
    assert scene.geometry[0].animation is InstanceAnimation.SPIN_ALONG_WORLD_UP


def test_transform_writes_through_soa_views(scene):
    """Transform edits must land in the SoA blocks pack_frame_params
    reads, not just the row object."""
    inst = scene.geometry[0]
    set_path(scene, "geometry[0].transforms[0].translation", [5.0, -2.0, 3.0])
    np.testing.assert_allclose(inst.translations[0], [5.0, -2.0, 3.0])


def test_transform_resets_to_original(scene):
    """The reference resets transforms to their spawn values, not to a
    global constant."""
    inst = scene.geometry[0]
    orig = inst.originals[0].translation.copy()
    set_path(scene, "geometry[0].transforms[0].translation", [9.0, 9.0, 9.0])
    reset_path(scene, "geometry[0].transforms[0].translation")
    np.testing.assert_allclose(inst.transforms[0].translation, orig)
    np.testing.assert_allclose(inst.translations[0], orig)


def test_apply_set_spec_and_camera_alias(scene):
    apply_set(scene, "camera.fov_degrees=85.5")
    assert scene.camera.fov_degrees == 85.5
    apply_set(scene, "camera.fov_degrees=default")
    assert scene.camera.fov_degrees == 70.0
    apply_set(scene, "sun_animation.frozen=true")
    assert scene.sun_animation.frozen is True


def test_bool_string_coercion(scene):
    set_path(scene, "render_atmosphere", "false")
    assert scene.render_atmosphere is False
    reset_path(scene, "render_atmosphere")
    assert scene.render_atmosphere is True


def test_get_path_and_bad_paths(scene):
    assert get_path(scene, "camera_speed") == scene.camera_speed
    with pytest.raises(KeyError):
        get_path(scene, "cameras[0]")  # object, not a property
    with pytest.raises((KeyError, AttributeError)):
        set_path(scene, "nonsense.path", 1)
    with pytest.raises(KeyError):
        reset_path(scene, "atmosphere.not_a_field")


def test_format_table_renders_columns_and_dirty_marker(scene):
    set_path(scene, "cameras[0].fov_degrees", 90)
    table = format_table(discover(scene))
    lines = table.splitlines()
    assert lines[0].split() == ["property", "value", "default"]
    row = next(line for line in lines if "fov_degrees" in line)
    assert "90" in row and "70" in row and row.rstrip().endswith("*")


def test_serve_state_round_trip():
    """The --serve viewer's state machine: render -> cached re-render ->
    fly-camera input invalidates -> property edit (and reset) re-renders
    a different frame. Exercises app/serve.py without HTTP (the handler
    is a thin JSON shim over _State)."""
    from syzygy_tpu.app.serve import _State
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.scene import default_scene

    scene, library = default_scene()
    config = RenderConfig(
        width=64,
        height=32,
        shadow_dim=128,
        skyview_width=64,
        skyview_height=16,
    )
    state = _State(scene, library, config)
    png1 = state.render_png()
    assert png1[:4] == b"\x89PNG"
    assert state.render_png() is png1  # clean state serves the cache

    state.handle_input("w", (0.0, 0.0), 0.25)
    png2 = state.render_png()
    assert png2 != png1  # the camera moved

    assert state.set_property("camera.fov_degrees", "110") == 110.0
    png3 = state.render_png()
    assert png3 != png2

    state.set_property("camera.fov_degrees", "default")
    assert get_path(state.scene, "camera.fov_degrees") == 70.0

    props = state.properties()
    assert any(p["path"] == "atmosphere.sun_euler_angles" for p in props)
    assert all(
        isinstance(p["value"], str) and "path" in p for p in props
    )


def test_serve_stats_report():
    """/api/stats payload: frame ms + FPS ring report (the performance
    window, ui/statelesswidgets.cpp:98-161) + Draw Results counters."""
    from syzygy_tpu.app.serve import _State
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.scene import default_scene

    scene, library = default_scene()
    state = _State(
        scene,
        library,
        RenderConfig(
            width=64, height=32, shadow_dim=128,
            skyview_width=64, skyview_height=16,
        ),
    )
    state.render_png()
    s = state.stats()
    assert s["last_ms"] > 0.0
    assert s["fps"] == "no samples"  # compile frame is not an FPS sample
    assert any("draw calls" in v for v in s["draw_results"].values())
    state.handle_input("w", (0.0, 0.0), 0.1)
    state.render_png()
    assert "avg" in state.stats()["fps"]


def test_serve_texture_inspector():
    """/api/textures + /texture.png: the TextureDisplay analog inside the
    interactive viewer (ui/texturedisplay.cpp:21-80) — every registered
    asset listed with native dims, served as PNG; unknown names 404."""
    import pytest

    from syzygy_tpu.app.serve import _State
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.scene import default_scene

    scene, library = default_scene()
    state = _State(
        scene,
        library,
        RenderConfig(
            width=64, height=32, shadow_dim=128,
            skyview_width=64, skyview_height=16,
        ),
    )
    texs = state.textures()
    assert texs and all(t["w"] > 0 and t["h"] > 0 for t in texs)
    png = state.texture_png(texs[0]["name"])
    assert png[:4] == b"\x89PNG"
    with pytest.raises(KeyError):
        state.texture_png("no-such-texture")


def test_serve_pipeline_double_buffer():
    """2-frames-in-flight presentation (editor/framebuffer.cpp:134): a
    dirty request returns the PREVIOUS frame and leaves the new dispatch
    in flight; the drain request (no new input) fetches it. The drained
    frame must equal what a non-pipelined render of the same scene state
    produces, and stats() must advertise the pending dispatch."""
    from syzygy_tpu.app.serve import _State
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.scene import default_scene

    cfg = RenderConfig(
        width=64, height=32, shadow_dim=128,
        skyview_width=64, skyview_height=16,
    )
    scene, library = default_scene()
    state = _State(scene, library, cfg, pipeline=True)

    png1 = state.render_png()  # cold first frame: synchronous
    assert not state.stats()["pending"]

    state.handle_input("w", (0.0, 0.0), 0.25)
    stale = state.render_png()  # dispatches, answers with the old frame
    assert stale is png1
    assert state.stats()["pending"]

    png2 = state.render_png()  # drain: no input since, fetches in-flight
    assert png2 != png1
    assert not state.stats()["pending"]
    assert state.render_png() is png2  # clean + drained serves the cache

    # the pipelined result is the same frame a synchronous state renders
    scene2, library2 = default_scene()
    ref = _State(scene2, library2, cfg)
    ref.handle_input("w", (0.0, 0.0), 0.25)
    assert ref.render_png() == png2


def test_serve_runtime_asset_loading(tmp_path):
    """/api/load: the reference's mid-session file dialogs
    (assets/assets.cpp:1615-1667 loads glTF meshes; ui/uiwidgets.hpp:74-99
    loads images with a per-file sRGB/linear choice). Merge adds the file's
    meshes to the current scene; replace swaps the whole scene (camera pose
    carried over); image paths register a texture with the sRGB flag."""
    import os

    from PIL import Image

    from syzygy_tpu.app.serve import _State
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.scene import default_scene

    cfg = RenderConfig(
        width=64, height=32, shadow_dim=128,
        skyview_width=64, skyview_height=16,
    )
    scene, library = default_scene()
    state = _State(scene, library, cfg, pipeline=True)
    png1 = state.render_png()
    n_before = len(state.scene.geometry)

    glb = os.path.join(os.path.dirname(__file__), "..", "assets", "sphere.glb")
    tris_before = state._geometry_host.triangles.shape[0]
    out = state.load_asset(glb, merge=True)
    assert out == {"meshes": 1}
    assert len(state.scene.geometry) == n_before + 1
    # the repacked device geometry includes the new mesh's triangles
    assert state._geometry_host.triangles.shape[0] > tris_before
    png2 = state.render_png()
    assert png2[:4] == b"\x89PNG"

    # image load with per-file sRGB choice
    img_path = tmp_path / "tex.png"
    Image.fromarray(
        np.tile(np.array([[64, 128]], np.uint8), (2, 1))[..., None].repeat(
            4, -1
        )
    ).save(img_path)
    out = state.load_asset(str(img_path), srgb=True)
    assert out == {"texture": "tex.png", "srgb": True}
    idx = state.library.lookup("tex.png")
    assert idx is not None and state.library.is_srgb(idx)
    # linear registration keeps raw values
    img2_path = tmp_path / "lin.png"
    Image.fromarray(np.full((2, 2, 4), 128, np.uint8)).save(img2_path)
    state.load_asset(str(img2_path), srgb=False)
    lin_idx = state.library.lookup("lin.png")
    np.testing.assert_allclose(
        state.library.get(lin_idx), 128 / 255.0, atol=1e-6
    )

    # replace: a fresh scene, camera pose carried over
    pos = state.scene.camera.position
    out = state.load_asset(glb, merge=False)
    assert out == {"scene": "sphere.glb"}
    assert len(state.scene.geometry) == 1
    assert tuple(state.scene.camera.position) == tuple(pos)
    png3 = state.render_png()
    assert png3[:4] == b"\x89PNG"

    # builtin scene names load like --scene (camera carried over)
    out = state.load_asset("chessboard")
    assert out == {"scene": "chessboard"}
    assert len(state.scene.geometry) > 1
    assert state.render_png()[:4] == b"\x89PNG"

    import pytest

    with pytest.raises(Exception):
        state.load_asset("/no/such/file.glb")


def test_serve_texture_srgb_display_roundtrip(tmp_path):
    """texture_png re-encodes sRGB-decoded color maps through the OETF so
    the inspector shows source brightness (stored texels are linear-light;
    serving them raw displayed color maps visibly darker)."""
    from PIL import Image

    from syzygy_tpu.app.serve import _State
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.scene import default_scene

    scene, library = default_scene()
    src = np.zeros((2, 2, 4), np.uint8)
    src[..., :3] = 100  # mid-gray: sRGB decode moves it a lot (~31 linear)
    src[..., 3] = 255
    library.register("color_map", src, srgb=True)
    library.register("linear_map", src, srgb=False)
    state = _State(
        scene, library,
        RenderConfig(width=64, height=32, shadow_dim=128,
                     skyview_width=64, skyview_height=16),
    )

    import io

    def served_pixel(name):
        png = state.texture_png(name)
        arr = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
        return int(arr[0, 0, 0])

    # sRGB round-trip: decode-at-register + OETF-at-display = source value
    assert abs(served_pixel("color_map") - 100) <= 1
    # linear maps serve raw stored values (no re-encode)
    assert served_pixel("linear_map") == 100


def test_ring_buffer_history_order():
    """RingBuffer.history(): oldest-to-newest across the wrap point (the
    sparkline's x axis, ui/statelesswidgets.cpp:98-161)."""
    from syzygy_tpu.utils import RingBuffer

    rb = RingBuffer()
    for i in range(7):
        rb.write(float(i))
    assert rb.history() == [float(i) for i in range(7)]
    for i in range(7, RingBuffer.CAPACITY + 10):
        rb.write(float(i))
    hist = rb.history()
    assert len(hist) == RingBuffer.CAPACITY
    assert hist[0] == 10.0 and hist[-1] == float(RingBuffer.CAPACITY + 9)
    assert hist == sorted(hist)


def test_serve_pipeline_config_editing():
    """Live RenderConfig editing through the viewer property table — the
    reflection-driven pipeline push-constant editor analog
    (ui/pipelineui.cpp:43-424). Fields come from dataclass reflection,
    coerce to the field's type, reset to the dataclass default, and an
    invalid combination surfaces as an error instead of a broken frame."""
    import pytest

    from syzygy_tpu.app.serve import _State
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.scene import default_scene

    scene, library = default_scene()
    state = _State(
        scene, library,
        RenderConfig(width=64, height=32, shadow_dim=128,
                     skyview_width=64, skyview_height=16),
    )
    props = {p["path"]: p for p in state.properties()}
    assert props["config.oetf"]["value"] == "srgb"
    assert props["config.pcf_f16"]["value"] == "True"
    assert props["config.shadow_dim"]["value"] == "128"

    png_srgb = state.render_png()
    assert state.set_property("config.oetf", "gamma") == "gamma"
    png_gamma = state.render_png()
    assert png_gamma != png_srgb  # different transfer function renders

    # reset-to-default goes back to the DATACLASS default
    assert state.set_property("config.oetf", "default") == "srgb"

    # type coercion: bool strings are parsed, not truthy-string'd
    assert state.set_property("config.pcf_f16", "False") is False
    assert state.set_property("config.pcf_f16", "true") is True
    assert state.set_property("config.shadow_dim", "256") == 256

    with pytest.raises(KeyError):
        state.set_config("no_such_field", "1")
    # invalid combination surfaces immediately (row chunks must divide)
    with pytest.raises(ValueError):
        state.set_config("sky_row_chunks", "7")


def test_serve_preview_refinement():
    """Progressive preview (resolution-scaling presentation): while input
    keeps the scene dirty frames render at 1/preview_scale resolution;
    when input stops the viewer refines to the EXACT full-resolution
    frame (identical bytes to a preview-disabled state)."""
    import io

    from PIL import Image

    from syzygy_tpu.app.serve import _State
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.scene import default_scene

    cfg = RenderConfig(
        width=128, height=64, shadow_dim=128,
        skyview_width=64, skyview_height=16,
    )

    def dims(png):
        return Image.open(io.BytesIO(png)).size

    scene, library = default_scene()
    state = _State(scene, library, cfg, preview_scale=2)
    png1 = state.render_png()
    assert dims(png1) == (128, 64)  # first frame is always full-res

    state.handle_input("w", (0.0, 0.0), 0.25)
    png2 = state.render_png()
    assert dims(png2) == (64, 32)  # live input renders the preview
    assert state.stats()["pending"]  # refinement owed

    png3 = state.render_png()
    assert dims(png3) == (128, 64)  # input stopped: exact full-res
    assert not state.stats()["pending"]
    assert state.render_png() is png3  # at rest: cached

    # the resting frame is EXACTLY what a preview-disabled viewer shows
    scene2, library2 = default_scene()
    ref = _State(scene2, library2, cfg, preview_scale=1)
    ref.render_png()
    ref.handle_input("w", (0.0, 0.0), 0.25)
    assert ref.render_png() == png3

    # pipelined variant drains through preview to the same full frame
    scene3, library3 = default_scene()
    pstate = _State(scene3, library3, cfg, preview_scale=2, pipeline=True)
    pstate.render_png()
    pstate.handle_input("w", (0.0, 0.0), 0.25)
    last = pstate.render_png()
    for _ in range(6):
        if not pstate.stats()["pending"]:
            break
        last = pstate.render_png()
    assert not pstate.stats()["pending"]
    assert dims(last) == (128, 64)
    assert last == png3


def test_serve_http_layer():
    """The HTTP handler itself (routing, JSON shimming, the cross-origin
    guard) over a real socket — endpoints chosen to avoid paying a frame
    render: /, /api/properties, /api/textures, /texture.png 404, bad
    JSON 400, unknown route 404, and the CSRF/DNS-rebinding rejections."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from syzygy_tpu.app import serve as serve_mod
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.scene import default_scene

    scene, library = default_scene()
    cfg = RenderConfig(width=64, height=32, shadow_dim=128,
                       skyview_width=64, skyview_height=16)

    # serve() blocks, so run it on a daemon thread against an ephemeral
    # port and only hit endpoints that never render a frame
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    t = threading.Thread(
        target=serve_mod.serve,
        args=(scene, library, cfg),
        kwargs={"port": port},
        daemon=True,
    )
    t.start()

    base = f"http://127.0.0.1:{port}"

    def wait_up(tries=50):
        for _ in range(tries):
            try:
                return urllib.request.urlopen(base + "/", timeout=2)
            except Exception:
                import time

                time.sleep(0.1)
        raise RuntimeError("server did not come up")

    page = wait_up().read()
    assert b"syzygy_tpu" in page and b"drawSpark" in page

    props = json.loads(
        urllib.request.urlopen(base + "/api/properties", timeout=10).read()
    )
    assert any(p["path"].startswith("config.") for p in props)

    texs = json.loads(
        urllib.request.urlopen(base + "/api/textures", timeout=10).read()
    )
    assert texs and all("name" in t for t in texs)

    # 404s
    for path in ("/texture.png?name=nope", "/no-such-route"):
        try:
            urllib.request.urlopen(base + path, timeout=10)
            assert False, f"{path} should 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404, (path, e.code)

    def post(path, data, headers=None):
        req = urllib.request.Request(
            base + path, data=data, headers=headers or {}, method="POST"
        )
        return urllib.request.urlopen(req, timeout=10)

    # bad JSON -> 400
    try:
        post("/api/set", b"{not json")
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400

    # cross-origin rejections (CSRF guard): bad Origin, bad Host
    for headers in (
        {"Origin": "http://evil.example"},
        {"Host": "evil.example"},
    ):
        try:
            post("/api/load", b'{"path": "/etc/passwd"}', headers)
            assert False, f"should 403 for {headers}"
        except urllib.error.HTTPError as e:
            assert e.code == 403, (headers, e.code)

    # same-origin POST works (no render: set a config field and reset it)
    r = json.loads(post(
        "/api/set", b'{"path": "config.debug_lines", "value": "true"}',
        {"Origin": f"http://127.0.0.1:{port}"},
    ).read())
    assert r == {"value": "True"}
    r = json.loads(post(
        "/api/set", b'{"path": "config.debug_lines", "value": "default"}'
    ).read())
    assert r == {"value": "False"}


def test_apply_config_field():
    """The shared RenderConfig edit core (viewer config.* rows + CLI
    --set config.*): reflected type coercion, default reset, and
    validate-before-construct (an invalid edit returns an error and the
    input config object is untouched)."""
    from syzygy_tpu.app.properties import apply_config_field
    from syzygy_tpu.renderer import RenderConfig

    cfg = RenderConfig(width=128, height=64)
    c2 = apply_config_field(cfg, "oetf", "gamma")
    assert c2.oetf == "gamma" and cfg.oetf == "srgb"
    assert apply_config_field(c2, "oetf", "default").oetf == "srgb"
    assert apply_config_field(cfg, "pcf_f16", "False").pcf_f16 is False
    assert apply_config_field(cfg, "shadow_dim", "256").shadow_dim == 256
    assert apply_config_field(cfg, "shadow_bias_slope", "-1.5").shadow_bias_slope == -1.5
    with pytest.raises(KeyError):
        apply_config_field(cfg, "nope", "1")
    with pytest.raises(ValueError):
        apply_config_field(cfg, "height", "0")
    with pytest.raises(ValueError):
        apply_config_field(cfg, "sky_row_chunks", "7")
