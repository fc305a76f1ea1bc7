"""L4 map alignment: ICP registration, bbox comparison, alignment animation."""

from tpu3dlm.alignment.align import Alignment  # noqa: F401
from tpu3dlm.alignment.comparison import BBoxComparison  # noqa: F401
