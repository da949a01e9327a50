"""arts-crossfit coefficient download.

Fetches the UHH cross-section fit coefficients archive (37 molecules) and
unpacks it into a local directory, the same data source the reference uses
(reference pyLBL/arts_crossfit/webapi.py:1-16).  Implemented here as an
in-memory streamed unzip: the archive is held in a BytesIO instead of a
temporary on-disk zip, so no cleanup file ever touches ``directory``.
"""
import io
import zipfile
from urllib.request import urlopen

URL = "https://attachment.rrz.uni-hamburg.de/df514eed/coefficients.zip"


def download(directory, name=None, url=URL):
    """Downloads and unpacks the coefficients archive into ``directory``.

    Args:
        directory: destination directory for the per-molecule netCDF files.
        name: unused (kept for call-compatibility with callers that pass
            the reference's temporary-file name).
        url: archive URL override (tests point this at a file:// fixture).

    Returns:
        The destination directory.
    """
    del name
    with urlopen(url) as response:
        payload = io.BytesIO(response.read())
    zipfile.ZipFile(payload).extractall(directory)
    return directory
