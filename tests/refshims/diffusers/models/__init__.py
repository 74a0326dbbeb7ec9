from . import (  # noqa: F401
    activations,
    attention_processor,
    lora,
    modeling_outputs,
    modeling_utils,
    normalization,
)
