from s3od_tpu.datagen.filters.consistency import HorizontalFlipConsistencyFilter
from s3od_tpu.datagen.filters.vlm import GemmaMaskArtifactFilter, GemmaSemanticFilter

__all__ = [
    "HorizontalFlipConsistencyFilter",
    "GemmaSemanticFilter",
    "GemmaMaskArtifactFilter",
]
