"""Interactive Plotly 3D projection with base64 thumbnail hovers.

Capability of ``src/visualization/plotly.py:12-94``: per-class Scatter3d
traces whose hover text embeds each sample as a base64 ``<img>`` data URI,
exported as a standalone HTML file. Re-designed for this framework's
pipeline: features/labels/images arrive as arrays from
:class:`~superdiff_tpu.analysis.features.FeatureExtractor` (no torch
DataLoader), the projection comes from the shared ``_project`` helper, and
the base64 encoding is a pure function unit-testable without plotly (which
is not in this image — the plotly import is gated, everything else runs).
"""

from __future__ import annotations

import base64
import io
import os
from typing import Optional, Sequence

import numpy as np

from superdiff_tpu.analysis.projection import _project

DEFAULT_CLASS_COLORS = ("green", "red", "royalblue", "orange", "purple")


def thumbnail_data_uri(image: np.ndarray, size: int = 64) -> str:
    """Encode one grayscale/RGB image as a PNG data URI.

    Accepts (H, W), (H, W, 1) or (H, W, 3); any float range (min-max
    normalized per image) or uint8. Pure PIL + base64 — the testable core
    of the reference's ``tensor_to_base64_image`` (``plotly.py:12-27``).
    """
    from PIL import Image

    img = np.asarray(image)
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    if img.dtype != np.uint8:
        img = img.astype(np.float32)
        lo, hi = float(img.min()), float(img.max())
        img = ((img - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)
    pil = Image.fromarray(img, "L" if img.ndim == 2 else "RGB")
    pil = pil.resize((size, size))
    buf = io.BytesIO()
    pil.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode("ascii")
    return f"data:image/png;base64,{b64}"


def hover_html(label_name: str, image: np.ndarray, size: int = 64) -> str:
    """Hover payload: class name + embedded thumbnail (``plotly.py:69-70``)."""
    return f'{label_name}<br><img src="{thumbnail_data_uri(image, size)}">'


def run_plotly_projection_3d_with_thumbnails(
        features: np.ndarray,
        labels: np.ndarray,
        images: Optional[np.ndarray] = None,
        path: str = "projection3d.html",
        method: str = "tsne",
        class_names: Optional[Sequence[str]] = None,
        class_colors: Optional[Sequence[str]] = None,
        thumb_size: int = 64,
        title: Optional[str] = None,
        emb: Optional[np.ndarray] = None) -> str:
    """3D projection -> interactive HTML with thumbnail hovers.

    ``images=None`` drops the hover thumbnails (plain class-colored
    markers) — the export path ``projection.py::run_projection_3d``
    delegates here so only one plotly exporter exists. Raises ImportError
    naming plotly when the optional dep is absent (the matplotlib 3D PNG
    path in ``projection.py`` has no such dependency).
    """
    try:
        import plotly.graph_objects as go
    except ImportError as e:
        raise ImportError(
            "plotly is not installed; install plotly for interactive 3D "
            "HTML export, or use run_projection_3d (matplotlib PNG)") from e

    labels = np.asarray(labels)
    if emb is None:   # caller may pass a precomputed (N, 3) projection
        emb = _project(np.asarray(features), method, 3)
    colors = class_colors or DEFAULT_CLASS_COLORS
    fig = go.Figure()
    for cls in np.unique(labels):
        mask = labels == cls
        name = (class_names[cls] if class_names is not None
                and cls < len(class_names) else f"class {cls}")
        hover_kw = {}
        if images is not None:
            hover_kw = dict(hoverinfo="text",
                            hovertext=[hover_html(name, images[i], thumb_size)
                                       for i in np.where(mask)[0]])
        fig.add_trace(go.Scatter3d(
            x=emb[mask, 0], y=emb[mask, 1], z=emb[mask, 2],
            mode="markers", name=name,
            marker=dict(size=6, color=colors[int(cls) % len(colors)],
                        opacity=0.85),
            **hover_kw))
    fig.update_layout(
        scene=dict(xaxis_title="Component 1", yaxis_title="Component 2",
                   zaxis_title="Component 3"),
        margin=dict(l=0, r=0, b=0, t=40),
        title=title or f"3D {method.upper()} projection with thumbnails")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.write_html(path)
    return path
