"""Host-side instrument & astrophysics models.

These assemble calibration Tables and Scene pytrees; no device compute
happens here (reference layers L1/L2: wayne/grism.py, wayne/detector.py,
star/planet handling in wayne/observation.py + exodata).
"""

from wayne_tpu.models.grism import Grism, G102, G141  # noqa: F401
from wayne_tpu.models.detector import WFC3IRDetector  # noqa: F401
from wayne_tpu.models.stellar import Star  # noqa: F401
from wayne_tpu.models.planet import Planet  # noqa: F401
