"""Streamlit dashboard (optional) — capability of
``src/visualization/dashboard.py:7-22`` (broken in the reference: undefined
``np``/``pretrained_model``). Three sections: image grid browser, embedding
explorer (.npy upload -> t-SNE), and Grad-CAM explainability.

streamlit is not in this image; ``launch_dashboard`` degrades to a clear
error, and ``render_app`` contains the importable app body for environments
that do have it (``streamlit run -m superdiff_tpu.analysis.dashboard``).
"""

from __future__ import annotations

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
    batch = next(iter(dm.iterator("train", batch_size=n)))
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
