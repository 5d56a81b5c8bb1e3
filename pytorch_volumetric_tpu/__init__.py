"""pytorch_volumetric_tpu: TPU-native differentiable distance-field engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
``pytorch_volumetric`` (flat public namespace mirroring the reference's
``__init__.py:1-9``): batched SDF value+gradient queries on meshes, voxel
grids with automatic expansion, unidirectional chamfer distance, and robot
model → SDF over batched joint configurations.
"""

from pytorch_volumetric_tpu.sdf import (
    SDFQuery, ObjectFactory, MeshObjectFactory, ObjectFrameSDF, SphereSDF,
    BoxSDF, CylinderSDF, CapsuleSDF,
    MeshSDF, NarrowBandMeshSDF, ComposedSDF, CachedSDF, OutOfBoundsStrategy,
    sample_mesh_points, aabb_corners,
)
from pytorch_volumetric_tpu.voxel import (
    Voxels, VoxelGrid, VoxelSet, ExpandingVoxelGrid, GridView,
    get_divisible_range_by_resolution, get_coordinates_and_points_in_grid,
    get_coherent_grid_points, get_coherent_tile_points, voxel_down_sample,
    bounds_contain_another_bounds,
)
from pytorch_volumetric_tpu.volume import is_inside
from pytorch_volumetric_tpu.transforms import (
    Transform3d, Translate, random_rotation, matrix_to_rotation_6d,
    euler_angles_to_matrix,
)
from pytorch_volumetric_tpu.chamfer import (
    batch_chamfer_dist, PlausibleDiversity, PlausibleDiversityReturn,
    pairwise_distance, pairwise_distance_chamfer,
)
from pytorch_volumetric_tpu.model_to_sdf import (
    RobotSDF, cache_link_sdf_factory, narrow_band_link_sdf_factory,
    aabb_to_ordered_end_points,
)
from pytorch_volumetric_tpu.kinematics import (
    Chain, SerialChain, build_chain_from_urdf, build_serial_chain_from_urdf,
    build_chain_from_sdf, build_serial_chain_from_sdf,
    build_chain_from_mjcf, build_serial_chain_from_mjcf,
)
from pytorch_volumetric_tpu.visualization import draw_sdf_slice, get_transformed_meshes
from pytorch_volumetric_tpu import mesh
from pytorch_volumetric_tpu import transforms
from pytorch_volumetric_tpu import kinematics
from pytorch_volumetric_tpu import models
from pytorch_volumetric_tpu.models import (
    NeuralSDF, ConfigSpaceNeuralSDF, fit_neural_sdf, fit_config_space_sdf,
)
from pytorch_volumetric_tpu.utils import robots
