"""Model zoo: scorers, embedders, and the model factory."""

from kge_tpu.models.base import (
    Ctx,
    EVAL_CTX,
    KgeBase,
    KgeEmbedder,
    KgeModel,
    LookupEmbedder,
    ProjectionEmbedder,
    RelationalScorer,
    Tucker3RelationEmbedder,
)
from kge_tpu.models.factorization import (
    CP,
    ComplEx,
    DistMult,
    RelationalTucker3,
    Rescal,
    SimplE,
)
from kge_tpu.models.neural import ConvE, Transformer
from kge_tpu.models.reciprocal import ReciprocalRelationsModel
from kge_tpu.models.translation import RotatE, TransE, TransH

__all__ = [
    "Ctx",
    "EVAL_CTX",
    "KgeBase",
    "KgeEmbedder",
    "KgeModel",
    "LookupEmbedder",
    "ProjectionEmbedder",
    "RelationalScorer",
    "Tucker3RelationEmbedder",
    "ComplEx",
    "CP",
    "DistMult",
    "Rescal",
    "RelationalTucker3",
    "SimplE",
    "ConvE",
    "Transformer",
    "ReciprocalRelationsModel",
    "RotatE",
    "TransE",
    "TransH",
]
