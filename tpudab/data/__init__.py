"""MSC packet-mode data channels (datagroups -> MOT) for data services.

Reference parity: Basic_Data_Packet_Channel (SURVEY.md sec 2.4;
/root/reference/src/render_radio_block.cpp:22,538-540).
"""

from tpudab.data.packet import (PacketChannel, parse_packet, build_packets,
                                PACKET_SIZES)
