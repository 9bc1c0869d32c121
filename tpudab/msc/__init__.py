"""L2 MSC path: CIF slicing, time (de)interleaving, subchannel decode."""

from tpudab.msc.interleave import TIME_INTERLEAVE_DEPTH, interleave_delays
