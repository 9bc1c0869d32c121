"""DAB service database: entities + updater fed by FIG events.

Reference parity: vendor/DAB-Radio `dab/database/dab_database{,_entities,
_updater}.h` (proven API at /root/reference/src/render_radio_block.cpp:26-27,
156-160, 238-307, 490-752, 754-778).
"""

from tpudab.database.entities import (
    Ensemble, Service, ServiceComponent, Subchannel, LinkService, FMService,
    DRMService, TransportMode, AudioServiceType, DataServiceType,
)
from tpudab.database.updater import DatabaseUpdater, Database, DatabaseStatistics
