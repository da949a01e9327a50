"""arts-crossfit coefficient download (reference
pyLBL/arts_crossfit/webapi.py:1-16)."""
from os import remove
from os.path import join
from urllib.request import urlopen
from zipfile import ZipFile

URL = "https://attachment.rrz.uni-hamburg.de/df514eed/coefficients.zip"


def download(directory, name="tmp.zip", url=URL):
    """Downloads and unpacks the coefficients zip into ``directory``."""
    zipped = join(directory, name)
    with urlopen(url) as result, open(zipped, "wb") as handle:
        handle.write(result.read())
    with ZipFile(zipped, "r") as archive:
        archive.extractall(directory)
    remove(zipped)
