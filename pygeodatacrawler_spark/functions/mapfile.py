"""Mapfile CLASS generation: colorCoding's three class modes (C7).

The reference's ``colorCoding`` (/root/reference/geodatacrawler/
mapfile.py:386-442) renders mapserver CLASS blocks three ways:

1. a color list -> EQUAL-WIDTH classes over [min,max] with
   ``Decimal`` precision-4 labels (``'{cur} - {cur+sgmt}'``) and
   ``EXPRESSION ( [prop] >= lo AND [prop] <= hi )``;
2. dict classes with ``val`` -> one CLASS per absolute value,
   ``EXPRESSION ( [prop] = val )`` with strings quoted
   (``quoteStr``, mapfile.py:500-504);
3. dict classes with ``min``/``max`` -> one CLASS per range.

Style bodies come from ``msStyler`` (mapfile.py:448-465) keyed on
geomtype, colors via ``hexcolor`` (mapfile.py:471-481).

Spark-first shape: classes are ROWS, not a concatenated string — a
catalog of 10^6 layers emits classes via one explode/join with no
driver loop; the mapfile sink (operators/harvest.py) concatenates
per-folder at write time. Labels use DECIMAL(38,4) rendering — a
deterministic, oracle-portable stand-in for the reference's
``getcontext().prec = 4`` (documented divergence: fixed 4-decimal
scale instead of 4 significant digits). All Column-only, codegen'd.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

DEFAULT_COLORS = ("#ff0000", "#ffff00", "#00ff00", "#00ffff", "#0000ff")


def _dec4(x: Column) -> Column:
    """Decimal-rendered class-boundary label component."""
    return x.cast("decimal(38,4)").cast("string")


def hexcolor(clr: Column) -> Column:
    """'r g b' or '#rrggbb' -> '#rrggbb'; null/empty -> '#CCCCCC'
    (mapfile.py:471-481)."""
    parts = F.split(F.trim(clr), r"\s+")
    # '{:02x}' lowercase like the reference's format string; F.hex is
    # uppercase, so lower only the rgb branch (passthrough unchanged)
    rgb = F.lower(
        F.concat(
            F.lit("#"),
            F.lpad(F.hex(F.element_at(parts, 1).cast("int")), 2, "0"),
            F.lpad(F.hex(F.element_at(parts, 2).cast("int")), 2, "0"),
            F.lpad(F.hex(F.element_at(parts, 3).cast("int")), 2, "0"),
        )
    )
    return (
        F.when(clr.isNull() | (F.trim(clr) == ""), F.lit("#CCCCCC"))
        .when(F.size(parts) == 3, rgb)
        .otherwise(clr)
    )


def ms_styler(
    geomtype: Column,
    color: Column,
    linecolor: Column | None = None,
    symbol: Column | None = None,
    size: Column | None = None,
    width: Column | None = None,
) -> Column:
    """STYLE body per geomtype (msStyler, mapfile.py:448-465).

    Optional args accept real Columns; ``x or F.lit(None)`` is NOT used
    because Python ``or`` would bool() a Column and raise. Unknown
    geomtypes render the literal string ``None`` — byte-parity with the
    reference, whose msStyler returns Python ``None`` that the caller's
    f-string interpolates as ``None`` (mapfile.py:464-465).
    """

    def _opt(x: Column | None) -> Column:
        return F.lit(None) if x is None else x

    col = hexcolor(F.coalesce(color, F.lit("#eeeeee")))
    lcol = hexcolor(F.coalesce(_opt(linecolor), F.lit("#232323")))
    sym = F.coalesce(_opt(symbol), F.lit("circle"))
    sz = F.coalesce(_opt(size).cast("double"), F.lit(5.0))
    wd = F.coalesce(_opt(width).cast("double"), F.lit(0.1))
    return (
        F.when(geomtype == "grid", F.format_string('COLOR "%s"\n', col))
        .when(
            geomtype == "point",
            F.format_string(
                'SYMBOL "%s"\nCOLOR "%s"\nSIZE %s\nOUTLINECOLOR "%s"\n'
                "OUTLINEWIDTH 0.1\n",
                sym, col, sz.cast("string"), lcol,
            ),
        )
        .when(
            geomtype == "polyline",
            F.format_string(
                'WIDTH %s\nCOLOR "%s"\nLINEJOIN "bevel"\n',
                wd.cast("string"), col,
            ),
        )
        .when(
            geomtype == "polygon",
            F.format_string(
                'COLOR "%s"\nOUTLINECOLOR "%s"\nOUTLINEWIDTH %s\n',
                col, lcol, wd.cast("string"),
            ),
        )
        .otherwise(F.lit("None"))
    )


def equal_width_classes(
    bounds: DataFrame,
    prop: str,
    colors: Sequence[str] = DEFAULT_COLORS,
    group_name: str = "Default",
) -> DataFrame:
    """Mode 1: per-layer equal-width classes from (mn, mx) bounds rows.

    ``bounds`` carries one row per layer with ``mn``/``mx`` columns
    (any other columns pass through as layer identity). Emits one row
    per class: idx, lo, hi, label, expression, color. The zero-range
    case collapses to the single ``[prop] = min`` class
    (mapfile.py:424-425); negative range emits nothing (429-431).
    """
    n = len(colors)
    color_arr = F.array(*[F.lit(c) for c in colors])
    rng = F.col("mx") - F.col("mn")
    sgmt = rng / n
    multi = (
        bounds.filter(rng > 0)
        .select("*", F.posexplode(color_arr).alias("idx", "color"))
        .withColumn("lo", F.round(F.col("mn") + F.col("idx") * sgmt, 4))
        .withColumn("hi", F.round(F.col("mn") + (F.col("idx") + 1) * sgmt, 4))
    )
    single = (
        bounds.filter(rng == 0)
        .withColumn("idx", F.lit(0))
        .withColumn("color", F.lit(colors[0]))
        .withColumn("lo", F.round(F.col("mn"), 4))
        .withColumn("hi", F.round(F.col("mn"), 4))
    )
    out = multi.unionByName(single)
    label = F.concat(_dec4(F.col("lo")), F.lit(" - "), _dec4(F.col("hi")))
    expr = F.format_string(
        "( [%s] >= %s AND [%s] <= %s )",
        F.lit(prop), _dec4(F.col("lo")), F.lit(prop), _dec4(F.col("hi")),
    )
    single_expr = F.format_string(
        "( [%s] = %s )", F.lit(prop), _dec4(F.col("lo"))
    )
    return out.select(
        *[c for c in bounds.columns if c not in ("mn", "mx")],
        "idx", "lo", "hi", "color",
        F.when(F.col("hi") > F.col("lo"), label)
        .otherwise(_dec4(F.col("lo"))).alias("label"),
        F.when(F.col("hi") > F.col("lo"), expr)
        .otherwise(single_expr).alias("expression"),
        F.lit(group_name).alias("grp"),
    )


def config_classes(
    layers: DataFrame,
    classes: DataFrame,
    prop: str,
    group_name: str = "Default",
) -> DataFrame:
    """Modes 2+3: config-driven value / range classes per layer.

    ``classes`` is the style config (small — broadcast): one row per
    class with nullable ``val``/``lbl``/``cmin``/``cmax``/``color``.
    A ``val`` row renders ``[prop] = val``; a ``cmin``/``cmax`` row
    renders the closed range. Label defaults: str(val) / 'min - max'
    (mapfile.py:430-437).

    quoteStr parity (mapfile.py:500-504): the reference quotes EVERY
    ``str`` val — including numeric-looking ones like ``'42'`` (its own
    todo notes this). Spark columns are mono-typed, so the rule maps to
    the column dtype: a string ``val`` column is always double-quoted,
    a numeric one never is.
    """
    val_is_str = dict(classes.dtypes).get("val") == "string"
    quoted = (
        F.concat(F.lit('"'), F.col("val"), F.lit('"'))
        if val_is_str
        else F.col("val").cast("string")
    )
    rendered = classes.select(
        "*",
        F.when(
            F.col("val").isNotNull(),
            F.format_string("( [%s] = %s )", F.lit(prop), quoted),
        )
        .when(
            F.col("cmin").isNotNull() & F.col("cmax").isNotNull(),
            F.format_string(
                "( [%s] >= %s AND [%s] <= %s )",
                F.lit(prop), F.col("cmin").cast("string"),
                F.lit(prop), F.col("cmax").cast("string"),
            ),
        )
        .alias("expression"),
        F.coalesce(
            F.col("lbl"),
            F.col("val"),
            F.concat(
                F.col("cmin").cast("string"),
                F.lit(" - "),
                F.col("cmax").cast("string"),
            ),
        ).alias("label"),
    ).filter(F.col("expression").isNotNull())
    return layers.join(F.broadcast(rendered), how="cross").withColumn(
        "grp", F.lit(group_name)
    )


def render_class_block(
    df: DataFrame, geomtype: Column | str = "polygon", name_quote: str = '"'
) -> DataFrame:
    """Rows -> full CLASS blocks (NAME/GROUP/EXPRESSION/STYLE...END).

    ``name_quote`` mirrors the reference's mode split: equal-width
    (mode 1) class names/groups are single-quoted (mapfile.py:419-425,
    ``NAME '{cur} - {cur+sgmt}'``) while dict-config modes 2+3 are
    double-quoted (mapfile.py:432-436). Pass ``"'"`` when rendering
    equal_width_classes rows for byte parity.
    """
    gt = F.lit(geomtype) if isinstance(geomtype, str) else geomtype
    q = name_quote
    return df.withColumn(
        "class_block",
        F.format_string(
            f"CLASS\nNAME {q}%s{q}\nGROUP {q}%s{q}\nEXPRESSION %s\nSTYLE\n%sEND\nEND\n\n",
            F.col("label"), F.col("grp"), F.col("expression"),
            ms_styler(gt, F.col("color")),
        ),
    )
