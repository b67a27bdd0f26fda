from hifigan_tpu.dsl.parsing import (  # noqa: F401
    parse_layer,
    parse_layer_param,
    parse_layer_params,
    parse_layers,
)
from hifigan_tpu.dsl.module import ConfigurableModule, get_module_from_config  # noqa: F401
