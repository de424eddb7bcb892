"""Dashboard — capability of ``src/visualization/dashboard.py:7-22``
(broken in the reference: undefined ``np``/``pretrained_model``). Three
sections: image grid browser, embedding explorer, and explainability.

Two renderers:
- :func:`launch_dashboard` — interactive streamlit app (optional dep; not
  in this image), app body in :func:`render_app`;
- :func:`build_static_dashboard` — the same three sections as ONE
  self-contained HTML file (thumbnails and plots inlined as base64 data
  URIs), dependency-free, suitable for run directories on TPU pods where
  no server can run.
"""

from __future__ import annotations

import base64
import glob
import html
import io
import os
import sys


def launch_dashboard(dataset_root: str, run_dir: str = "") -> None:
    try:
        import streamlit  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "streamlit is not installed in this environment; install it to "
            "use the dashboard, or use superdiff_tpu.cli.inspect_data / "
            "cli.visualize for static artifacts") from e
    os.environ["SUPERDIFF_DASHBOARD_ROOT"] = dataset_root
    os.environ["SUPERDIFF_DASHBOARD_RUN"] = run_dir
    os.system(f"{sys.executable} -m streamlit run {__file__}")


def _png_data_uri(path: str) -> str:
    with open(path, "rb") as f:
        return ("data:image/png;base64,"
                + base64.b64encode(f.read()).decode("ascii"))


def build_static_dashboard(dataset_root: str,
                           out_html: str,
                           run_dir: str = "",
                           task: str = "PNEUMONIA",
                           num_images: int = 16,
                           max_embed_samples: int = 96,
                           histogram_equalization: bool = False) -> str:
    """Render the dashboard's three sections into one standalone HTML.

    No server, no optional deps: image grid (CLAHE togglable at build
    time), t-SNE embedding explorer over random-CNN features, and an
    explainability/run-artifacts section embedding any PNGs found in
    ``run_dir`` (loss curve, epoch samples, Grad-CAM overlays).
    """
    import numpy as np

    from superdiff_tpu.analysis import (FeatureExtractor, extract_features,
                                        run_projection, thumbnail_data_uri)
    from superdiff_tpu.config import Config
    from superdiff_tpu.data import DataModule

    cfg = Config()
    cfg.task = task
    cfg.training.histogram_equalization = histogram_equalization
    cfg.training.batch_size = min(num_images, 32)
    dm = DataModule(cfg, dataset_root)
    idx = dm.index("train")
    batch = next(iter(dm.iterator("train", epoch=0)))
    imgs, labels = batch["image"], batch["label"]

    parts = ["<html><head><meta charset='utf-8'>"
             "<title>superdiff_tpu dashboard</title>"
             "<style>body{font-family:sans-serif;margin:2em;}"
             "img.t{margin:2px;border:1px solid #888;}"
             "h2{border-bottom:1px solid #ccc;}</style></head><body>",
             f"<h1>superdiff_tpu explorer — {html.escape(task)}</h1>",
             f"<p>dataset: {html.escape(os.path.abspath(dataset_root))}"
             f" · classes: {', '.join(map(html.escape, idx.classes))}"
             f" · CLAHE: {'on' if histogram_equalization else 'off'}</p>"]

    parts.append("<h2>Image grid</h2>")
    for i in range(min(num_images, len(imgs))):
        name = idx.classes[int(labels[i])]
        parts.append(
            f"<img class='t' title='{html.escape(name)}' "
            f"src='{thumbnail_data_uri(imgs[i], 96)}'>")

    parts.append("<h2>Embedding explorer (t-SNE, random-CNN features)</h2>")
    ex = FeatureExtractor("random")
    feats, flabels = extract_features(
        ex, dm.device_batches("train", __import__("jax").random.PRNGKey(0)),
        max_samples=max_embed_samples)
    tsne_png = out_html + ".tsne.png"
    run_projection(feats, flabels, "tsne", tsne_png,
                   class_names=idx.classes)
    parts.append(f"<img src='{_png_data_uri(tsne_png)}' width='480'>")
    os.remove(tsne_png)

    parts.append("<h2>Explainability / run artifacts</h2>")
    pngs = sorted(glob.glob(os.path.join(run_dir, "*.png"))) if run_dir \
        else []
    if pngs:
        for p in pngs:
            parts.append(f"<h3>{html.escape(os.path.basename(p))}</h3>"
                         f"<img src='{_png_data_uri(p)}' width='640'>")
    else:
        parts.append("<p>No run artifacts found; run "
                     "<code>python -m superdiff_tpu.cli.inspect_data "
                     "--set viz.gradcam=true</code> for Grad-CAM "
                     "overlays.</p>")
    parts.append("</body></html>")

    os.makedirs(os.path.dirname(out_html) or ".", exist_ok=True)
    with open(out_html, "w") as f:
        f.write("\n".join(parts))
    return out_html


def render_app() -> None:  # pragma: no cover - requires streamlit runtime
    import numpy as np
    import streamlit as st

    from superdiff_tpu.analysis import (
        FeatureExtractor, run_projection)
    from superdiff_tpu.config import Config
    from superdiff_tpu.data import DataModule

    st.title("superdiff_tpu explorer")
    root = os.environ.get("SUPERDIFF_DASHBOARD_ROOT", "data")
    cfg = Config()
    dm = DataModule(cfg, root)

    st.header("Image grid")
    n = st.slider("images", 4, 32, 8)
    use_clahe = st.checkbox("CLAHE")
    cfg.training.histogram_equalization = use_clahe
    batch = next(iter(dm.iterator("train", batch_size=n, epoch=0)))
    st.image([batch["image"][i, :, :, 0] for i in range(n)], width=96)

    st.header("Embedding explorer")
    up = st.file_uploader("features .npy")
    if up is not None:
        feats = np.load(up)
        path = run_projection(feats, np.zeros(len(feats)), "tsne",
                              "/tmp/dash_tsne.png")
        st.image(path)

    st.header("Explainability")
    st.write("Run `python -m superdiff_tpu.cli.inspect_data "
             "--set viz.gradcam=true` for Grad-CAM overlays.")


if __name__ == "__main__":  # pragma: no cover
    render_app()
