"""MOT (Multimedia Object Transfer, EN 301 234) + slideshow (TS 101 499).

Reference parity: MOT processor + Basic_Slideshow_Manager (SURVEY.md sec 2.3,
2.4): segment assembly -> objects; slideshow with transport_id,
trigger/expire times, category/slide ids, URLs
(/root/reference/src/render_radio_block.cpp:309-384).
"""

from tpudab.mot.mot import (MSCDataGroup, parse_msc_data_group,
                            build_msc_data_group, MOTObject, MOTAssembler,
                            build_mot_object_groups, ContentType)
from tpudab.mot.slideshow import Slideshow, SlideshowManager
