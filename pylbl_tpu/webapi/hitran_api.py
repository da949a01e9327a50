"""HITRAN web API client.

Same REST contract as the reference client (reference
pyLBL/webapi/hitran_api.py:8-248): v2 endpoints for server info, parameter
metadata, molecules, isotopologues, CSV transition result files and
cross-section files.  The CSV parsing is factored into
:func:`parse_transitions` so it can be tested offline.
"""
from json import loads
from urllib.error import HTTPError
from urllib.request import build_opener, install_opener, ProxyHandler, urlopen


class NoCrossSectionError(BaseException):
    pass


class NoIsotopologueError(BaseException):
    pass


class NoTransitionsError(BaseException):
    pass


class Query:
    """URL query-string helper (reference hitran_api.py:222-243)."""

    def __init__(self, **argv):
        self.string = "&".join(
            f"{key}={self.process(value)}" for key, value in argv.items())

    @staticmethod
    def process(value):
        if type(value) in [bool, float, int, str]:
            return str(value)
        if type(value) in [list, set, tuple]:
            return ",".join(str(v) for v in value)
        raise TypeError(f"bad type for query: '{value}'")


class Struct:
    """Attribute bag for API records (reference hitran_api.py:246-248)."""

    def __init__(self, **attrs):
        self.__dict__.update(attrs)


def parse_transitions(data, parameters, types):
    """Parses a HITRAN CSV results file into Structs, skipping malformed
    rows with a warning (reference hitran_api.py:173-185)."""
    transitions = []
    for line in data.split("\n"):
        line = line.strip()
        if not line:
            continue
        try:
            transitions.append(Struct(**{
                name: cast(cell) for name, cast, cell in
                zip(parameters, types, line.split(","))}))
        except ValueError:
            print(f"skipping transition: {line}")
    return transitions


class HitranWebApi:
    """Access to the hitran.org REST API.

    Attributes:
        api_key: hitran.org API key string.
        host: server URL.
        parameters: list of Structs describing available line parameters.
    """

    def __init__(self, api_key, api_version="v2", host="https://hitran.org",
                 proxy=None):
        self.api_key = api_key
        self.api_version = api_version
        self.host = host
        self.proxy = proxy
        server_info = self._download_section("info")
        self.transition_directory = \
            server_info["content"]["data"]["results_dir"]
        self.cross_section_directory = \
            server_info["content"]["data"]["xsec_dir"]
        self.timestamp = server_info["timestamp"]
        self.parameters = self._download_parameters_metadata()

    def _download(self, url, chunk):
        if self.proxy:
            install_opener(build_opener(ProxyHandler(self.proxy)))
        response = urlopen(url)
        data = []
        while True:
            buf = response.read(chunk)
            if not buf:
                break
            data.append(buf.decode("utf-8"))
        return "".join(data)

    def _download_file(self, prefix, name, chunk=64 * 1024 * 1024):
        return self._download("/".join([self.host, prefix, name]), chunk)

    def _download_section(self, api_section, query=None, chunk=1024 * 1024):
        url = "/".join([self.host, "api", self.api_version, self.api_key,
                        api_section])
        if query is not None:
            url = "?".join([url, query.string])
        return loads(self._download(url, chunk))

    def _download_parameters_metadata(self, pattern=None):
        query = None if pattern is None else Query(name__icontains=pattern)
        return [Struct(**x) for x in self._download_section(
            "parameter-metas", query)["content"]["data"]]

    def download_data_sources(self, ids=None):
        query = None if ids is None else Query(id__in=ids)
        return self._download_section("sources", query)["content"]["data"]

    def download_molecules(self):
        return [Struct(**x) for x in
                self._download_section("molecules")["content"]["data"]]

    def download_isotopologues(self, molecules):
        if type(molecules) not in [list, tuple]:
            molecules = [molecules]
        ids = [x.id for x in molecules]
        return [Struct(**x) for x in self._download_section(
            "isotopologues", Query(molecule_id__in=ids))["content"]["data"]]

    def download_transitions_csv(self, isotopologues, numin, numax,
                                 parameters=None):
        """Downloads the raw CSV results file for a set of isotopologues.

        Returns:
            (csv_text, parameters) — the bulk-ingestion path hands the text
            to the native parser (csrc/pylbl_native.cpp) instead of
            Python row splitting.
        """
        if type(isotopologues) not in [list, tuple]:
            isotopologues = [isotopologues]
        ids = [x.id for x in isotopologues]
        if not ids:
            raise NoIsotopologueError("no isotopologues present.")
        if parameters is None:
            parameters = [x.name for x in self.parameters][:22]
        query = Query(iso_ids_list=ids, numin=numin, numax=numax,
                      head=False, fixwidth=0,
                      request_params=",".join(parameters))
        try:
            name = self._download_section("transitions",
                                          query)["content"]["data"]
        except HTTPError:
            raise NoTransitionsError(
                f"no transitions found for "
                f"{isotopologues[0].molecule_alias}.")
        return self._download_file(self.transition_directory,
                                   name), parameters

    def download_transitions(self, isotopologues, numin, numax,
                             parameters=None):
        data, parameters = self.download_transitions_csv(
            isotopologues, numin, numax, parameters)
        type_mapping = {"float": float, "int": int, "str": str}
        types = [type_mapping[x.type] for x in self.parameters]
        return parse_transitions(data, parameters, types)

    def download_cross_sections(self, molecules):
        if type(molecules) not in [list, tuple]:
            molecules = [molecules]
        ids = [x.id for x in molecules]
        bands = self._download_section(
            "cross-sections", Query(molecule_id__in=ids))["content"]["data"]
        cross_sections = []
        for band in bands:
            data = self._download_file(self.cross_section_directory,
                                       band["filename"])
            attrs = {"data": data}
            attrs.update(band)
            cross_sections.append(Struct(**attrs))
        return cross_sections
