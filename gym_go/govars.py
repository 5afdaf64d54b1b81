from gymgo_tpu.govars import *  # noqa: F401,F403
