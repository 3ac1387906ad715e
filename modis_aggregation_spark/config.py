"""Typed query configuration — the engine's replacement for the reference's
argv + CSV configs.

Reference behavior being modeled (cited for parity, no code reused):
* 15-16 positional CLI args parsed in ``read_user_inputs``
  (reference ``MODIS_Aggregation/aggregate_functions.py:459-504``).
* Variable list + 1-D histogram bin edges from a whitespace-delimited CSV
  (``examples/input_file_5km.csv``; parsed at ``aggregate_functions.py:485-497``).
* Joint-histogram config: joint label, partner-variable index, 2-D edges
  (``examples/input_Jhist_5km.csv``; parsed at ``:498-502``).
* Grid-divisibility validation (``:524-530``).

The engine makes this a frozen dataclass built at plan time; all stringly
typed values (comma-separated edges) are parsed once, here, into real lists.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class VariableSpec:
    """One physical (or derived) variable to aggregate.

    ``cloud_fraction_CM`` is virtual: not read from the source, derived from
    the decoded cloud mask (reference ``aggregate_functions.py:133-134,366-369``).
    """

    name: str
    bin_edges: tuple[float, ...] = ()
    units: str = "none"
    scale_factor: float = 1.0
    add_offset: float = 0.0
    fill_value: float = -9999.0
    long_name: str = ""

    @property
    def is_virtual(self) -> bool:
        return self.name == "cloud_fraction_CM"


@dataclass(frozen=True)
class JointHistSpec:
    """A 2-D joint histogram: x-variable paired with a partner y-variable.

    The reference selects the partner by positional index into the variable
    list (``aggregate_functions.py:498-502``); the engine uses names.
    """

    varname: str
    joint_name: str
    partner_var: str
    joint_edges: tuple[float, ...]


# The seven statistic switches of the reference CLI
# (``aggregate_functions.py:479-480``).
ALL_STATS = (
    "Minimum",
    "Maximum",
    "Mean",
    "Pixel_Counts",
    "Standard_Deviation",
    "Histogram_Counts",
    "Jhisto",
)


@dataclass(frozen=True)
class AggregationSpec:
    """Full parameterization of one L2→L3 aggregation query."""

    # region polygon [lat0, lat1] x [lon0, lon1]; strict bounds (quirk Q7)
    lat_bounds: tuple[float, float] = (-90.0, 90.0)
    lon_bounds: tuple[float, float] = (-180.0, 180.0)
    # grid cell size (d_lat, d_lon) in degrees
    grid: tuple[float, float] = (1.0, 1.0)
    # inclusive date range (ISO strings); the catalog adds the 3-hour spill
    start_date: str = "2008-01-01"
    end_date: str = "2008-01-01"
    # systematic sampling stride (1 = keep everything); quirk Q6: the engine
    # uses ONE consistent offset (i-2)%n==0 AND (j-2)%n==0
    sampling: int = 1
    sampling_offset: tuple[int, int] = (2, 2)
    # which statistics to compute
    stats: tuple[str, ...] = ALL_STATS
    # definition-of-day spill hours (reference hardcodes 3,
    # ``aggregate_functions.py:591``)
    shift_hours: int = 3
    # variables + joint histograms
    variables: tuple[VariableSpec, ...] = field(default_factory=tuple)
    joint_hists: tuple[JointHistSpec, ...] = field(default_factory=tuple)
    # replicate reference quirks Q1-Q6 bit-for-bit where feasible
    strict_compat: bool = False

    def __post_init__(self) -> None:
        lat0, lat1 = self.lat_bounds
        lon0, lon1 = self.lon_bounds
        d_lat, d_lon = self.grid
        if not (lat1 > lat0 and lon1 > lon0):
            raise ValueError("region bounds must be increasing")
        if d_lat <= 0 or d_lon <= 0:
            raise ValueError("grid steps must be positive")
        # grid divisibility validation (reference ``:524-530``)
        for extent, step, what in (
            (lat1 - lat0, d_lat, "lat"),
            (lon1 - lon0, d_lon, "lon"),
        ):
            ratio = extent / step
            if abs(ratio - round(ratio)) > 1e-9:
                raise ValueError(
                    f"{what} extent {extent} is not an integer multiple of grid step {step}"
                )
        if self.sampling < 1:
            raise ValueError("sampling stride must be >= 1")
        unknown = set(self.stats) - set(ALL_STATS)
        if unknown:
            raise ValueError(f"unknown statistics: {sorted(unknown)}")

    @property
    def nlat(self) -> int:
        return round((self.lat_bounds[1] - self.lat_bounds[0]) / self.grid[0])

    @property
    def nlon(self) -> int:
        return round((self.lon_bounds[1] - self.lon_bounds[0]) / self.grid[1])

    @property
    def ncells(self) -> int:
        return self.nlat * self.nlon

    def physical_variables(self) -> tuple[VariableSpec, ...]:
        return tuple(v for v in self.variables if not v.is_virtual)

    def variable(self, name: str) -> VariableSpec:
        for v in self.variables:
            if v.name == name:
                return v
        raise KeyError(name)


def _parse_edge_list(s: str) -> tuple[float, ...]:
    """Parse a comma-separated edge string (the reference keeps these
    stringly typed and re-parses with ``np.fromstring`` at use sites,
    ``aggregate_functions.py:258,267-268``; we parse once)."""
    s = s.strip()
    if not s:
        return ()
    return tuple(float(x) for x in s.split(",") if x.strip())


def parse_variable_csv(path: str) -> tuple[VariableSpec, ...]:
    """Parse the reference's variable-config CSV format.

    Format (whitespace-delimited, one header line): ``varname edges``
    where ``edges`` is a comma-separated list of 1-D histogram bin edges
    (``examples/input_file_5km.csv``).
    """
    out: list[VariableSpec] = []
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    for ln in lines[1:]:
        parts = ln.split()
        name = parts[0]
        edges = _parse_edge_list(parts[1]) if len(parts) > 1 else ()
        out.append(VariableSpec(name=name, bin_edges=edges))
    return tuple(out)


def parse_jhist_csv(path: str, variables: tuple[VariableSpec, ...]) -> tuple[JointHistSpec, ...]:
    """Parse the reference's joint-histogram CSV.

    Format: ``varname joint_label partner_index edges`` where
    ``partner_index`` is 1-based into the variable CSV order
    (``aggregate_functions.py:498-502``); resolved to a name here.
    """
    out: list[JointHistSpec] = []
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    for ln in lines[1:]:
        parts = ln.split()
        varname, joint_name, partner_idx, edges = (
            parts[0],
            parts[1],
            int(parts[2]),
            _parse_edge_list(parts[3]),
        )
        partner = variables[partner_idx - 1].name
        out.append(
            JointHistSpec(
                varname=varname,
                joint_name=joint_name,
                partner_var=partner,
                joint_edges=edges,
            )
        )
    return tuple(out)


# Reference bin edges (examples/input_file_5km.csv:2-6), reused by fixtures
# and tests so M5/M6 exercise the exact production bucket boundaries.
REFERENCE_EDGES: dict[str, tuple[float, ...]] = {
    "ctp": (50.5, 150.0, 250.0, 350.0, 450.0, 550.0, 650.0, 750.0, 850.0, 950.0, 1050.0),
    "ctt": tuple(float(x) for x in range(190, 320, 10)),
    "cee": (0.05, 0.15, 0.25, 0.35, 0.45, 0.55, 0.65, 0.75, 0.85, 0.95),
    "cloud_fraction_CM": (0.02, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95),
    "cth": (500.0, 2500.0, 4500.0, 6500.0, 8500.0, 10500.0, 12500.0, 14500.0, 17500.0),
}


def default_spec(**overrides) -> AggregationSpec:
    """The canonical 5-variable spec mirroring the reference's 5-km run
    (``MODIS_Aggregation_Local_Commands.sh:21``)."""
    variables = (
        VariableSpec("ctp", REFERENCE_EDGES["ctp"], units="hPa", scale_factor=0.1),
        VariableSpec("ctt", REFERENCE_EDGES["ctt"], units="K", scale_factor=0.01),
        VariableSpec("cee", REFERENCE_EDGES["cee"], units="none", scale_factor=0.01),
        VariableSpec(
            "cloud_fraction_CM",
            REFERENCE_EDGES["cloud_fraction_CM"],
            units="none",
            scale_factor=1e-4,
        ),
        VariableSpec("cth", REFERENCE_EDGES["cth"], units="m", scale_factor=1.0),
    )
    joint_hists = (
        JointHistSpec("ctp", "Emissivity", "cee", (0.25, 0.725, 0.975)),
        JointHistSpec("cee", "Pressure", "ctp", (199.5, 550.0, 900.0)),
    )
    base = dict(variables=variables, joint_hists=joint_hists)
    base.update(overrides)
    return AggregationSpec(**base)
