from .vocab import Vocabulary, load_labels
from .manifest import read_manifests, ManifestEntry
from .audio import read_audio
from .datamodule import AsrDataModule
from .pipeline import BucketBatcher, Batch

__all__ = [
    "Vocabulary",
    "load_labels",
    "read_manifests",
    "ManifestEntry",
    "read_audio",
    "AsrDataModule",
    "BucketBatcher",
    "Batch",
]
