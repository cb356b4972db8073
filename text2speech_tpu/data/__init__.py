"""Data pipelines: batched text+mel datasets, vocoder segments, preprocessing."""
from .dataset import Batch, TextMelDataset, load_manifest  # noqa: F401
from .mel2samp import Mel2Samp, VocoderBatch, files_to_list  # noqa: F401
