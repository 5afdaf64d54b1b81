"""Channel-index constants for the 6-channel Go state.

Layout parity with the reference engine (see /root/reference/gym_go/govars.py:1-11):
the state of one game is a ``(NUM_CHNLS, SIZE, SIZE)`` array of 0/1 values; a batch
is ``(B, NUM_CHNLS, SIZE, SIZE)``.  TURN/PASS/DONE are whole-plane indicators.
"""

ANYONE = None
NOONE = -1

BLACK = 0
WHITE = 1
TURN_CHNL = 2
INVD_CHNL = 3
PASS_CHNL = 4
DONE_CHNL = 5

NUM_CHNLS = 6
