"""Codec backend parity: the optional Pillow fast path must be
hash-identical to the from-scratch codecs on the synthesized payloads the
media queries run over (lossless formats are bit-exact by spec; JPEG is
builtin-only under ``auto`` — see the policy note in multimodal.py).

In a container without Pillow the ``pillow`` parametrization skips with
that exact reason; the ``builtin`` leg always runs, so the seam's
dispatch logic (env validation, fallback) stays covered either way.
"""

from __future__ import annotations

import numpy as np
import pytest

from query_skyline_qos_flink_spark.operators import multimodal as mm

_HAS_PIL = True
try:
    import PIL.Image  # noqa: F401
except ImportError:
    _HAS_PIL = False

needs_pillow = pytest.mark.skipif(
    not _HAS_PIL, reason="Pillow not installed in this environment"
)


@pytest.fixture()
def backend_env(monkeypatch):
    def set_backend(mode):
        monkeypatch.setenv("SPARK_GRAFT_IMAGE_BACKEND", mode)

    return set_backend


def test_backend_selector_validates_and_falls_back(backend_env):
    backend_env("builtin")
    assert mm._image_backend() == "builtin"
    backend_env("bogus")
    with pytest.raises(ValueError):
        mm._image_backend()
    backend_env("pillow")
    if _HAS_PIL:
        assert mm._image_backend() == "pillow"
    else:
        with pytest.raises(ImportError):
            mm._image_backend()


def _decode_all_png(keys):
    return {
        k: mm.decode_image(mm.synth_png_payload(k)) for k in keys
    }


@needs_pillow
def test_png_decode_bit_identical_across_backends(backend_env):
    keys = [0, 1, 7, 42]
    backend_env("builtin")
    ref = _decode_all_png(keys)
    backend_env("auto")
    fast = _decode_all_png(keys)
    for k in keys:
        assert ref[k][:3] == fast[k][:3]
        np.testing.assert_array_equal(ref[k][3], fast[k][3])


@needs_pillow
def test_gif_decode_bit_identical_across_backends(backend_env):
    """Explicit pillow opt-in vs builtin on the fixture shapes (full-
    canvas frames, no disposal/transparency — the subset where Pillow
    and the spec-background builtin semantics coincide).  Keys avoid the
    %5==3 class, which emits animated WebP, not GIF; under the default
    `auto` backend GIF stays builtin (see decode_gif), so there is no
    silent swap to test there."""
    keys = [0, 1, 9]
    backend_env("builtin")
    ref = {k: mm.decode_gif(mm.synth_gif_payload(k)) for k in keys}
    backend_env("pillow")
    fast = {k: mm.decode_gif(mm.synth_gif_payload(k)) for k in keys}
    for k in keys:
        assert ref[k][:3] == fast[k][:3]
        np.testing.assert_array_equal(ref[k][3], fast[k][3])


def test_jpeg_stays_builtin_under_auto(backend_env):
    """JPEG must NOT silently swap decoders under auto: libjpeg's
    fixed-point IDCT may differ by ±1 LSB from the exact float IDCT."""
    backend_env("auto")
    payload = mm.synth_jpeg_payload(5)
    h, w, c, arr = mm.decode_image(payload)
    backend_env("builtin")
    h2, w2, c2, arr2 = mm.decode_image(payload)
    assert (h, w, c) == (h2, w2, c2)
    np.testing.assert_array_equal(arr, arr2)


def test_builtin_backend_forces_from_scratch_path(backend_env):
    backend_env("builtin")
    h, w, c, arr = mm.decode_image(mm.synth_png_payload(11))
    assert arr.shape == (h, w, c) and arr.dtype == np.uint8
