"""Receiver models: composed decode pipelines (reference: basic_radio)."""

from tpudab.models.receiver import Receiver, AudioChannelOutput
from tpudab.models.pipeline import OfflinePipeline, decode_iq
