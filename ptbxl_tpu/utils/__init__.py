from ptbxl_tpu.utils.rng import set_seed, key_from_seed  # noqa: F401
