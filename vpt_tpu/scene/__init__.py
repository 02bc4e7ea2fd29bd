from vpt_tpu.scene.camera import Camera, OrbitController  # noqa: F401
from vpt_tpu.scene.transform import Node, Transform  # noqa: F401
from vpt_tpu.scene.volume import Volume  # noqa: F401
