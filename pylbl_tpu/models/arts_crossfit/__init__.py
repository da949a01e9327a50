from .cross_section import (CrossSection, calculate_xsec,  # noqa: F401
                            calculate_xsec_fullmodel)

try:  # webapi needs network; import is always safe (urllib is stdlib).
    from ...webapi.arts_crossfit_api import download  # noqa: F401
except ImportError:  # pragma: no cover
    pass
