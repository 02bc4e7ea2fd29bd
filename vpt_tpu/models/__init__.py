from vpt_tpu.models.base import RENDERERS, make_renderer  # noqa: F401

# importing a renderer module registers it with the factory
from vpt_tpu.models import mcm_spectral  # noqa: F401
from vpt_tpu.models import mcm  # noqa: F401
from vpt_tpu.models import mcs  # noqa: F401
from vpt_tpu.models import raymarch  # noqa: F401
from vpt_tpu.models import dos  # noqa: F401
from vpt_tpu.models import lao  # noqa: F401
