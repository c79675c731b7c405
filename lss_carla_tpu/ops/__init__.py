from lss_carla_tpu.ops.geometry import (  # noqa: F401
    gen_dx_bx,
    create_frustum,
    get_geometry,
    ego_to_cam,
    cam_to_ego,
    get_only_in_img_mask,
    get_rot,
)
from lss_carla_tpu.ops.splat import (  # noqa: F401
    voxel_indices,
    splat_scatter_add,
    voxel_pooling,
)
from lss_carla_tpu.ops.image import (  # noqa: F401
    normalize_img,
    denormalize_img,
    resize_bilinear_align_corners,
    upsample_align_corners,
)
