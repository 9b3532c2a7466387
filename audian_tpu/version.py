"""Version and platform directories for audian-tpu.

TPU-native re-implementation counterpart of the reference's
`src/audian/version.py:1-14` (version string + platformdirs cache paths).
"""

import platformdirs

__version__ = "0.5.0"
__year__ = "2026"

#: Platform-specific directories (user cache holds the fulltrace pyramid
#: cache, see audian_tpu.cache.fulltrace).
audian_dirs = platformdirs.PlatformDirs(
    appname="audian-tpu", appauthor="audian", version=None
)
