from gymgo_tpu.gogame import *  # noqa: F401,F403
from gymgo_tpu.gogame import str  # noqa: F401,A004 (shadows builtin, as the reference does)
