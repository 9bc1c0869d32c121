"""DAB signal synthesizer — test fixture (inverse pipeline: bits -> OFDM IQ).

The reference repo ships no recorded IQ and validates against captures
(SURVEY.md sec 4); this package replaces that with a standard-driven
modulator so every test is self-contained: ensemble description -> FIG/FIB
bytes -> FIC/MSC coding -> OFDM frames -> IQ with configurable CFO, timing
offset and AWGN.
"""

from tpudab.synth.modulator import modulate_frame_bits, Impairments, apply_impairments
from tpudab.synth.ensemble import (
    EnsembleSpec, ServiceSpec, SubchannelSpec, EnsembleSynthesizer,
    ASCTY_DAB, ASCTY_DAB_PLUS, TMID_STREAM_AUDIO, TMID_PACKET_DATA,
)
