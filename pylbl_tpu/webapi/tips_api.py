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

    def _records(self, response, molecule):
        """Yields per-temperature rows for one molecule's block
        (reference tips_api.py:90-119).

        Raises:
            NoMoleculeError: molecule heading not found.
        """
        found_molecule = False
        num_isotopologues = 0
        for line in self._ascii_table_records(response):
            if found_molecule:
                if match(r"\s*[A-Za-z0-9+]+$", line):
                    break
                elif num_isotopologues > 0:
                    yield [np.float32(x.strip())
                           for x in line.split()[:(num_isotopologues + 1)]]
                elif match(r"\s*T / K", line):
                    num_isotopologues = sum(x == "Q" for x in line)
            elif line.startswith("c"):
                continue
            else:
                found_molecule = match(rf"\s*{molecule}$", line)
        if not found_molecule:
            raise NoMoleculeError(
                f"molecule {molecule} not found in TIPS 2017 tables.")
