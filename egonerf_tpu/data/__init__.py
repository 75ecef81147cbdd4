from .datasets import (
    EgocentricVideoDataset,
    EgoNeRFDataset,
    LLFFDataset,
    OmniBlenderDataset,
    OmniscenesDataset,
    SyntheticEgoDataset,
    dataset_dict,
)
from .samplers import SimpleSampler, ThetaImportanceSampler
