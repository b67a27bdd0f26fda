"""Runtime environment knobs.

Library defaults stay hardware-neutral; environment-specific behaviour is
opt-in through purpose-named ``HIFIGAN_TPU_*`` variables.
"""

from __future__ import annotations

import os


def donation_default() -> bool:
    """Resolve whether train steps should donate their input state buffers.

    Order of precedence:

    1. ``HIFIGAN_TPU_NO_DONATE`` — purpose-named override. ``1/true/yes``
       disables donation, ``0/false/no`` forces it on.
    2. Dev-tunnel autodetect (``PALLAS_AXON_POOL_IPS`` set): donation off.
       Through the axon tunnel donated-state steps dispatch ~45x slower and
       outputs aliasing donated inputs cannot be fetched at all
       (docs/OPERATIONS.md) — tunnel sessions that forget the override
       would otherwise be unusable.
    3. Default: donate (halves train-state HBM on real hardware).
    """
    override = os.environ.get("HIFIGAN_TPU_NO_DONATE")
    if override is not None:
        return override.strip().lower() in ("0", "false", "no", "")
    return not os.environ.get("PALLAS_AXON_POOL_IPS")
