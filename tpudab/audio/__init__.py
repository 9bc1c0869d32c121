"""L1/L2 audio: DAB+ superframes (Firecode/RS/AAC AUs), MP2 frames, codecs,
mixer pipeline.

Reference parity: vendor/DAB-Radio `dab/audio/aac_frame_processor.h`,
mp2 decode via mpg123, audio mixing from examples/audio (SURVEY.md sec 2.3,
2.5)."""
