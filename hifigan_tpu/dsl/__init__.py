from hifigan_tpu.dsl.parsing import (  # noqa: F401
    parse_layer,
    parse_layer_param,
    parse_layer_params,
    parse_layers,
)
from hifigan_tpu.dsl.module import ConfigurableModule, get_module_from_config  # noqa: F401
from hifigan_tpu.dsl.normalize import normalize_config  # noqa: F401


def tag_config(config, tags):
    """Attach feature-capture tags to any config node (the reference's
    TagsWrapper, custom_wrappers.py:4-11 — here tags are config data, not a
    module wrapper)."""
    if isinstance(config, tuple):
        return (*config, list(tags))
    return [*config, list(tags)]
