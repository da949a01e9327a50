"""HITRAN web API client.

Same REST contract as the reference client (reference
pyLBL/webapi/hitran_api.py:8-248): v2 endpoints for server info, parameter
metadata, molecules, isotopologues, CSV transition result files and
cross-section files.  The CSV parsing is factored into
:func:`parse_transitions` so it can be tested offline.
"""
from json import loads
from types import SimpleNamespace
from urllib.error import HTTPError
from urllib.request import build_opener, install_opener, ProxyHandler, urlopen


class NoCrossSectionError(BaseException):
    pass


class NoIsotopologueError(BaseException):
    pass


class NoTransitionsError(BaseException):
    pass


# API records are plain attribute bags; the stdlib namespace covers the
# reference's record type (reference hitran_api.py:246-248).
Struct = SimpleNamespace


def _scalar(value):
    if isinstance(value, (bool, float, int, str)):
        return str(value)
    raise TypeError(f"bad type for query: '{value}'")


def query_string(**params):
    """Serializes kwargs to the HITRAN REST query-string dialect: scalars
    verbatim, sequences comma-joined (no percent-encoding — the server
    expects raw commas)."""
    parts = []
    for key, value in params.items():
        if isinstance(value, (list, set, tuple)):
            encoded = ",".join(_scalar(v) for v in value)
        else:
            encoded = _scalar(value)
        parts.append(f"{key}={encoded}")
    return "&".join(parts)


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
        """Constructs the client without touching the network; server info
        and parameter metadata are fetched lazily on first use so the
        client is unit-testable offline."""
        self.api_key = api_key
        self.api_version = api_version
        self.host = host
        self.proxy = proxy
        self._server_info = None
        self._parameters = None

    def _info(self):
        if self._server_info is None:
            self._server_info = self._download_section("info")
        return self._server_info

    @property
    def transition_directory(self):
        return self._info()["content"]["data"]["results_dir"]

    @property
    def cross_section_directory(self):
        return self._info()["content"]["data"]["xsec_dir"]

    @property
    def timestamp(self):
        return self._info()["timestamp"]

    @property
    def parameters(self):
        if self._parameters is None:
            self._parameters = self._download_parameters_metadata()
        return self._parameters

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
            url = "?".join([url, query])
        return loads(self._download(url, chunk))

    def _download_parameters_metadata(self, pattern=None):
        query = None if pattern is None else query_string(
            name__icontains=pattern)
        return [Struct(**x) for x in self._download_section(
            "parameter-metas", query)["content"]["data"]]

    def download_data_sources(self, ids=None):
        query = None if ids is None else query_string(id__in=ids)
        return self._download_section("sources", query)["content"]["data"]

    def download_molecules(self):
        return [Struct(**x) for x in
                self._download_section("molecules")["content"]["data"]]

    def download_isotopologues(self, molecules):
        if type(molecules) not in [list, tuple]:
            molecules = [molecules]
        ids = [x.id for x in molecules]
        return [Struct(**x) for x in self._download_section(
            "isotopologues",
            query_string(molecule_id__in=ids))["content"]["data"]]

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
        query = query_string(iso_ids_list=ids, numin=numin, numax=numax,
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
            "cross-sections",
            query_string(molecule_id__in=ids))["content"]["data"]
        cross_sections = []
        for band in bands:
            data = self._download_file(self.cross_section_directory,
                                       band["filename"])
            attrs = {"data": data}
            attrs.update(band)
            cross_sections.append(Struct(**attrs))
        return cross_sections
