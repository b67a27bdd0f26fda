from hifigan_tpu.utils.pytree import get_recursive, do_recursive, detach_recursively  # noqa: F401
