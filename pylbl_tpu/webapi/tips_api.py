"""TIPS 2017 web API client.

Streams and parses the fixed-format ASCII supplementary tables (same
source and record grammar as the reference, reference
pyLBL/webapi/tips_api.py:9-124).  The block/record parsing works on any
binary file-like object so it is testable offline.
"""
from re import match
from urllib.request import urlopen

import numpy as np


class NoMoleculeError(BaseException):
    """No TIPS data found for this molecule."""
    pass


class TipsWebApi:
    """Access to the TIPS 2017 tables.

    Attributes:
        url: source URL of the ASCII table.
    """

    def __init__(self):
        self.url = ("http://faculty.uml.edu/Robert_Gamache/"
                    "Software/temp/Supplementary_file.txt")

    def download(self, molecule):
        """Downloads and parses the table for one molecule.

        Returns:
            (temperature[nT], data[nIso, nT]) float32-derived arrays
            (the reference parses with float32, tips_api.py:86-88).
        """
        return self._parse_records(self._records(urlopen(self.url),
                                                 molecule))

    @staticmethod
    def _ascii_table_records(response, block_size=512):
        """Yields complete lines from a block-buffered binary response.

        Same role as reference tips_api.py:31-68 but with correct carry-over
        for partial lines spanning block boundaries (the reference drops the
        carried prefix when a block contains no newline, or when a carried
        line completes a single-line block — harmless at its 512-byte blocks
        with ~60-char records, but wrong in general).
        """
        record = ""
        while True:
            block = response.read(block_size).decode("utf-8")
            if not block:
                yield record
                break
            lines = block.split("\n")
            lines[0] = record + lines[0]
            record = lines.pop()  # incomplete tail ("" if block ends in \n).
            yield from lines
            if len(block) != block_size:
                yield record
                break

    @staticmethod
    def _parse_records(records):
        temperature, q = [], []
        for record in records:
            if record:
                temperature.append(record[0])
                q.append(record[1:])
        temperature = np.asarray(temperature, dtype=np.float32)
        data = np.transpose(np.asarray(q, dtype=np.float32))
        return temperature, data

    # Table grammar: comment lines start with "c"; a bare formula on its
    # own line heads each molecule block; a "T / K  Q  Q ..." header gives
    # the isotopologue count; numeric rows follow until the next heading.
    _HEADING = r"\s*[A-Za-z0-9+]+$"
    _COLUMN_HEADER = r"\s*T / K"

    def _records(self, response, molecule):
        """Yields per-temperature [T, Q1..Qn] rows for one molecule's block
        (same grammar as reference tips_api.py:90-119; restructured as
        explicit seek/header/body stages over one shared line iterator).

        Raises:
            NoMoleculeError: molecule heading not found.
        """
        lines = iter(self._ascii_table_records(response))

        # Stage 1: seek the molecule's heading line.
        heading = rf"\s*{molecule}$"
        for line in lines:
            if not line.startswith("c") and match(heading, line):
                break
        else:
            raise NoMoleculeError(
                f"molecule {molecule} not found in TIPS 2017 tables.")

        # Stage 2: the column header fixes how many Q columns to read.
        num_columns = 0
        for line in lines:
            if match(self._HEADING, line):
                return
            if match(self._COLUMN_HEADER, line):
                num_columns = 1 + line.count("Q")
                break

        # Stage 3: numeric rows until the next molecule heading.
        for line in lines:
            if match(self._HEADING, line):
                return
            yield [np.float32(cell) for cell in line.split()[:num_columns]]
