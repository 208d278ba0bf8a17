from espresso_tpu.data.dictionary import AsrDictionary
from espresso_tpu.data.manifest import load_manifest, ManifestEntry
from espresso_tpu.data.dataset import AsrDataset
from espresso_tpu.data.iterators import EpochBatchIterator

__all__ = [
    "AsrDictionary",
    "load_manifest",
    "ManifestEntry",
    "AsrDataset",
    "EpochBatchIterator",
]
