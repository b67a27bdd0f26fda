from hifigan_tpu.callbacks.base import Callback, TrainLoop  # noqa: F401
from hifigan_tpu.callbacks.checkpoints import (  # noqa: F401
    BestCheckpointCallback,
    ContinuousCheckpointCallback,
    HistoryCheckpointCallback,
)
from hifigan_tpu.callbacks.logging import (  # noqa: F401
    OutputLoggingCallback,
    OutputSumCallback,
    OutputSumResetCallback,
    rank,
)
from hifigan_tpu.callbacks.valves import ValveDecayCallback  # noqa: F401
from hifigan_tpu.callbacks.visualization import (  # noqa: F401
    ConfusionLoggingCallback,
    ValidationClassificationCallback,
    ValidationVisualizationCallback,
    ModelGraphVisualizationCallback,
)
