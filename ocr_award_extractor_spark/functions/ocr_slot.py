"""Pluggable OCR backend slot for raster-image payloads.

The reference's REAL input type is an image decoded by cv2 and read by
PaddleOCR (certificate_ocr.py:98,:111-117). Neither ships in this
container, so the image leg is an explicit SLOT: payloads with a raster
magic route here, and without a registered backend they become clean
``status='error'`` rows (the reference's own contract for unreadable
inputs, certificate_ocr.py:100-105) instead of being garbage-parsed as
text. On a cluster, ``register_ocr_backend`` installs the real engine —
one function, imported once per Python worker; nothing else changes.

A backend receives the raw payload bytes and returns the reference's OCR
shape: ``(lines: list[str], confs: list[float])`` (certificate_ocr.py:
134-146). The two-strategy raw/enhanced fan-out and pick-best live INSIDE
a real backend, as they do in the reference (:107-131).
"""

from __future__ import annotations

from collections.abc import Callable

IMAGE_MAGICS: tuple[tuple[bytes, str], ...] = (
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
)

_BACKEND: Callable[[bytes], tuple[list[str], list[float]]] | None = None
_BACKEND_SPEC_ERROR: str | None = None


def register_ocr_backend(fn: Callable[[bytes], tuple[list[str], list[float]]] | None) -> None:
    """Install (or clear, with None) the image→text backend — PER PROCESS.

    Executor Python workers do not share the driver's module state, so for
    a cluster job set the env var ``SPARK_GRAFT_OCR_BACKEND=module:attr``
    (via ``spark.executorEnv.…`` / ``spark.yarn.appMasterEnv.…``): each
    worker resolves the import path once at module import. Direct
    registration is for driver-side use and tests."""
    global _BACKEND, _BACKEND_SPEC_ERROR
    _BACKEND = fn
    # a stale import-time spec failure must not shadow the ordinary
    # "needs an OCR backend" hint once a backend is explicitly set/cleared
    _BACKEND_SPEC_ERROR = None


def _load_backend_spec(spec: str | None = None) -> bool:
    """Resolve 'module:attr' into the active backend. Returns True if one
    was installed. Called at import with the env spec; exposed for tests."""
    import importlib
    import os

    spec = spec if spec is not None else os.environ.get("SPARK_GRAFT_OCR_BACKEND", "")
    if not spec:
        return False
    mod_name, _, attr = spec.partition(":")
    register_ocr_backend(getattr(importlib.import_module(mod_name), attr))
    return True


try:
    _load_backend_spec()
except Exception as _e:   # bad spec must NOT poison every extract_page call
    # (the import runs before any routing) — surface it per image row instead
    _BACKEND_SPEC_ERROR = f"OCR backend spec failed to load: {_e}"


def sniff_image(payload: bytes) -> str | None:
    """Image format by magic bytes, or None if not a raster payload."""
    for magic, fmt in IMAGE_MAGICS:
        if payload[:len(magic)] == magic:
            return fmt
    # BMP: the bare 2-byte 'BM' prefix is far too weak (ordinary text can
    # start with it) — also require the 4 reserved header bytes to be zero
    if (len(payload) >= 14 and payload[:2] == b"BM"
            and payload[6:10] == b"\x00\x00\x00\x00"):
        return "bmp"
    return None


def ocr_image_page(payload: bytes, fmt: str) -> dict:
    """Image payload → the pipeline's page shape (status/message/lines/
    confs/strategy). No backend ⇒ error row, never an exception."""
    if _BACKEND is None:
        msg = _BACKEND_SPEC_ERROR or (
            f"{fmt} payload needs an OCR backend "
            "(register_ocr_backend on a cluster with paddleocr)"
        )
        return {"status": "error", "message": msg,
                "lines": [], "confs": [], "strategy": ""}
    try:
        raw_lines, raw_confs = _BACKEND(payload)
    except Exception as e:   # backend failure → error ROW (cert:100-105)
        return {"status": "error", "message": f"ocr failed: {e}",
                "lines": [], "confs": [], "strategy": ""}
    # blank filter drops text+conf PAIRS together (cert:139-143) — filtering
    # lines alone would misalign every surviving line's confidence
    kept = [(ln, c) for ln, c in zip(raw_lines, raw_confs) if ln and ln.strip()]
    if not kept:
        return {"status": "error", "message": "no text extracted",
                "lines": [], "confs": [], "strategy": ""}
    return {"status": "success", "message": "",
            "lines": [ln for ln, _ in kept],
            "confs": [float(c) for _, c in kept],
            "strategy": f"ocr-{fmt}"}
