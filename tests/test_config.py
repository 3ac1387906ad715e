"""Config model + reference CSV format parsing."""

import pytest

from modis_aggregation_spark.config import (
    AggregationSpec,
    default_spec,
    parse_jhist_csv,
    parse_variable_csv,
)


def test_spec_validation():
    with pytest.raises(ValueError, match="integer multiple"):
        AggregationSpec(lat_bounds=(0.0, 10.5), grid=(1.0, 1.0))
    with pytest.raises(ValueError, match="increasing"):
        AggregationSpec(lat_bounds=(10.0, 0.0))
    with pytest.raises(ValueError, match="sampling"):
        AggregationSpec(sampling=0)
    with pytest.raises(ValueError, match="unknown statistics"):
        AggregationSpec(stats=("Bogus",))


def test_grid_shape():
    spec = AggregationSpec(
        lat_bounds=(-90.0, 90.0), lon_bounds=(-180.0, 180.0), grid=(0.5, 0.625)
    )
    assert spec.nlat == 360 and spec.nlon == 576
    assert spec.ncells == 207_360


def test_parse_reference_csv_formats(tmp_path):
    # mirror of examples/input_file_5km.csv layout (whitespace-delimited)
    vcsv = tmp_path / "vars.csv"
    vcsv.write_text(
        "Variable_Name Histogram_Intervals\n"
        "ctp 50.5,150,250\n"
        "cloud_fraction_CM 0.02,0.1\n"
    )
    variables = parse_variable_csv(str(vcsv))
    assert [v.name for v in variables] == ["ctp", "cloud_fraction_CM"]
    assert variables[0].bin_edges == (50.5, 150.0, 250.0)
    assert variables[1].is_virtual

    jcsv = tmp_path / "jhist.csv"
    jcsv.write_text(
        "Variable_Name Joint_Name Partner_Index Intervals\n"
        "ctp Fraction 2 0.25,0.725\n"
    )
    jh = parse_jhist_csv(str(jcsv), variables)
    assert jh[0].partner_var == "cloud_fraction_CM"
    assert jh[0].joint_edges == (0.25, 0.725)


def test_default_spec():
    spec = default_spec()
    assert len(spec.variables) == 5
    assert spec.variable("ctp").bin_edges[0] == 50.5
    assert len(spec.joint_hists) == 2
    assert spec.physical_variables() == tuple(
        v for v in spec.variables if v.name != "cloud_fraction_CM"
    )


def test_reference_cli_argv_parsing():
    from modis_aggregation_spark.reference_cli import (
        parse_data_path_csv,
        parse_reference_argv,
    )

    argv = [
        "examples/data_path.csv", "2008/01/01", "2008/01/02",
        "[-20,20,0,35]", "[1,1]", "[1]",
        "1", "1", "1", "1", "1", "1", "1",
        "examples/input_variables.csv", "examples/input_jhist.csv",
    ]
    spec, data_csv = parse_reference_argv(argv)
    assert spec.lat_bounds == (-20.0, 20.0)
    assert spec.lon_bounds == (0.0, 35.0)
    assert spec.grid == (1.0, 1.0)
    assert spec.start_date == "2008-01-01" and spec.end_date == "2008-01-02"
    assert spec.sampling == 1
    assert len(spec.stats) == 7
    assert [v.name for v in spec.variables] == ["ctp", "cee", "cloud_fraction_CM"]
    assert spec.joint_hists[0].partner_var == "cee"
    px, gr = parse_data_path_csv(data_csv)
    assert px.endswith("pixels.parquet") and gr.endswith("granules.parquet")

    # switches off -> stats subset; jhist off drops the second CSV
    argv2 = argv[:6] + ["1", "0", "1", "0", "0", "0", "0"] + [argv[13]]
    spec2, _ = parse_reference_argv(argv2)
    assert spec2.stats == ("Minimum", "Mean")
    assert spec2.joint_hists == ()


def test_reference_cli_end_to_end(spark, tmp_path):
    """The reference's positional command line runs the whole engine."""
    import os

    from modis_aggregation_spark.reference_cli import main

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "ref_cli_out")
    rc = main([
        os.path.join(repo, "examples/data_path.csv"),
        "2008/01/01", "2008/01/02",
        "[-20,20,0,35]", "[1,1]", "[1]",
        "1", "1", "1", "1", "1", "1", "1",
        os.path.join(repo, "examples/input_variables.csv"),
        os.path.join(repo, "examples/input_jhist.csv"),
        out,
    ])
    assert rc == 0
    df = spark.read.parquet(out)
    assert df.count() == 40 * 35
    assert "ctp_cee_jhist" in df.columns and "cf_hist" in df.columns


def test_reference_cli_15_args_without_output_path(spark):
    """The reference's own 15-arg form (jhist on, no output path) must NOT
    have its jhist CSV eaten by the output-path heuristic. Relative paths
    resolve against the JVM working directory (fixed at session start), so
    assert via the same resolution and clean up after."""
    import os
    import shutil

    from modis_aggregation_spark.reference_cli import main

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = spark.read  # touch session so the JVM cwd is established
    try:
        rc = main([
            os.path.join(repo, "examples/data_path.csv"),
            "2008/01/01", "2008/01/02",
            "[-20,20,0,35]", "[1,1]", "[1]",
            "1", "1", "1", "1", "1", "1", "1",
            os.path.join(repo, "examples/input_variables.csv"),
            os.path.join(repo, "examples/input_jhist.csv"),
        ])
        assert rc == 0
        df = spark.read.parquet("l3_output.parquet")  # same relative resolution
        assert df.count() == 40 * 35
        assert "ctp_cee_jhist" in df.columns
    finally:
        shutil.rmtree(os.path.join(os.getcwd(), "l3_output.parquet"), ignore_errors=True)
