"""Analysis package — the reference's empty ``src/analysis/__init__.py``
made real: feature extraction, latent projections (t-SNE/UMAP, 2D/3D,
thumbnails), Grad-CAM, model comparison, and FID evaluation."""

from superdiff_tpu.analysis.features import (
    FeatureExtractor, extract_features)
from superdiff_tpu.analysis.projection import (
    run_projection, run_projection_with_thumbnails,
    compare_tsne_umap_thumbnails, run_projection_3d)
from superdiff_tpu.analysis.gradcam import (
    compute_gradcam, compute_gradcam_from_fns, make_backbone_cam_fns,
    run_gradcam, run_gradcam_backbone)
from superdiff_tpu.analysis.fid import frechet_distance, compute_fid
from superdiff_tpu.analysis.plotly3d import (
    run_plotly_projection_3d_with_thumbnails, thumbnail_data_uri)

__all__ = [
    "FeatureExtractor", "extract_features", "run_projection",
    "run_projection_with_thumbnails", "compare_tsne_umap_thumbnails",
    "run_projection_3d", "compute_gradcam", "compute_gradcam_from_fns",
    "make_backbone_cam_fns", "run_gradcam", "run_gradcam_backbone",
    "frechet_distance", "compute_fid",
    "run_plotly_projection_3d_with_thumbnails", "thumbnail_data_uri",
]
