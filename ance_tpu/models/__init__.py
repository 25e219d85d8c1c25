from ance_tpu.models.dot_models import BiEncoder, RobertaDot
from ance_tpu.models.registry import REGISTRY, ModelSpec, get_model_spec
from ance_tpu.models.transformer import EncoderConfig, TransformerEncoder
