from .mesh import make_mesh, shot_sharding
from .shots import (distribute_shots, pad_shots, make_sharded_rtm_pallas,
                    make_sharded_modeling_pallas,
                    make_sharded_modeling_tiled, make_sharded_rtm_tiled)
from .domain import (
    halo_exchange, sharded_laplacian, make_sharded_forward_modeling,
    make_sharded_rtm_snapshot, make_sharded_rtm_full,
    embed_source_fields, embed_dobs, embed_injection_rows,
)
from .domain2d import (
    halo_exchange_axis, sharded_laplacian_2d,
    make_sharded_forward_modeling_2d, make_sharded_rtm_snapshot_2d,
    make_sharded_rtm_full_2d,
)
from .domain_pallas import (
    halo_exchange_lanes, make_sharded_rtm_snapshot_pallas,
    make_sharded_forward_modeling_pallas,
)
from .domain2d_pallas import (
    halo_exchange_2d, make_sharded_rtm_snapshot_2d_pallas,
    make_sharded_forward_modeling_2d_pallas,
)
