from mvlt_tpu.models.bert_embeddings import BertEmbeddings
from mvlt_tpu.models.pvlt import PVLT, create_model, MODEL_REGISTRY
from mvlt_tpu.models import heads

__all__ = ["BertEmbeddings", "PVLT", "create_model", "MODEL_REGISTRY", "heads"]
