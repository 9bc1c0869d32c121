"""Programme-Associated Data: F-PAD/X-PAD parsing, dynamic labels, MOT-in-PAD.

Reference parity: PAD processor (SURVEY.md sec 2.3): dynamic labels (song
titles) + MOT slideshow segments carried in X-PAD; GetDynamicLabel surface
(/root/reference/src/render_radio_block.cpp:425-427,470-472).
"""

from tpudab.pad.xpad import (XPADProcessor, extract_pad_from_dabplus_au,
                             extract_pad_from_mp2_frame, build_xpad_into_au,
                             DynamicLabelDecoder)
