"""FIC path: soft bits -> FIBs -> FIG events (feeds the DAB database).

Reference parity: vendor/DAB-Radio FIC decoder + FIG processor
(SURVEY.md sec 2.3). Device side = depuncture + batched Viterbi
(tpudab.ops.viterbi); host side = CRC checks and byte-level FIG parsing.
"""

from tpudab.fic.fib import decode_fic_frame, fic_soft_to_fib_bytes
from tpudab.fic.fig_parser import parse_fib, FIGEvent
