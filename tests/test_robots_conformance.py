"""Table-driven robots.txt conformance corpus.

Vectors transcribed from the PUBLIC matching tables in RFC 9309 and
Google's robots.txt documentation (the same semantics Google's
open-source C++ parser pins in robots_test.cc): path-rule wildcard
matching and Allow/Disallow longest-match precedence. Each row is
(rule or rule-set, url-path, expected verdict) run through the same
helpers the engine and the sequential oracle share
(functions/robots.py: _rule_structs / robots_allowed_py), so the corpus
documents exactly which RFC subset the rebuild implements.
"""

from __future__ import annotations

import pytest

from pygeodatacrawler_spark.functions.robots import (
    _rule_structs,
    parse_robots_py,
    robots_allowed_py,
)

HOST = "https://example.com"


# -- path matching (Google docs: "URL matching based on path values") --------

PATH_MATCH = [
    # rule, path, matches?
    ("/fish", "/fish", True),
    ("/fish", "/fish.html", True),
    ("/fish", "/fishheads", True),
    ("/fish", "/fish/salmon.html", True),
    ("/fish", "/fishheads/yummy.html", True),
    ("/fish", "/fish.php?id=anything", True),
    ("/fish", "/Fish.asp", False),  # case-sensitive
    ("/fish", "/catfish", False),
    ("/fish", "/?id=fish", False),
    ("/fish", "/desserts/fish", False),
    # trailing * is equivalent
    ("/fish*", "/fishheads/yummy.html", True),
    ("/fish*", "/catfish", False),
    ("/fish/", "/fish/", True),
    ("/fish/", "/fish/salmon.htm", True),
    ("/fish/", "/fish/?id=anything", True),
    ("/fish/", "/fish", False),
    ("/fish/", "/fish.html", False),
    ("/fish/", "/animals/fish/", False),
    ("/*.php", "/index.php", True),
    ("/*.php", "/filename.php", True),
    ("/*.php", "/folder/filename.php", True),
    ("/*.php", "/folder/filename.php?parameters", True),
    ("/*.php", "/folder/any.php.file.html", True),
    ("/*.php", "/filename.php/", True),
    ("/*.php", "/", False),
    ("/*.php", "/windows.PHP", False),
    ("/*.php$", "/filename.php", True),
    ("/*.php$", "/folder/filename.php", True),
    ("/*.php$", "/filename.php?parameters", False),
    ("/*.php$", "/filename.php/", False),
    ("/*.php$", "/filename.php5", False),
    ("/*.php$", "/windows.PHP", False),
    ("/fish*.php", "/fish.php", True),
    ("/fish*.php", "/fishheads/catfish.php?parameters", True),
    ("/fish*.php", "/Fish.PHP", False),
]


@pytest.mark.parametrize("rule,path,expected", PATH_MATCH)
def test_path_rule_matching(rule, path, expected):
    # a lone Disallow rule: URL blocked iff the rule matches
    allowed = robots_allowed_py(HOST + path, _rule_structs([rule]), [])
    assert allowed == (not expected)


# -- precedence (Google docs: "Order of precedence for rules") ---------------

PRECEDENCE = [
    # allow-rule, disallow-rule, path, allowed?
    ("/p", "/", "/page", True),  # /p longer than /
    ("/folder", "/folder", "/folder/page", True),  # tie -> allow
    ("/page", "/*.htm", "/page.htm", False),  # /*.htm (6) > /page (5)
    ("/page", "/*.ph", "/page.php5", True),  # tie (5 = 5) -> allow
    ("/$", "/", "/", True),  # /$ (2) > / (1)
    ("/$", "/", "/page.htm", False),  # /$ doesn't match, / does
]


@pytest.mark.parametrize("allow,disallow,path,expected", PRECEDENCE)
def test_rule_precedence(allow, disallow, path, expected):
    assert (
        robots_allowed_py(
            HOST + path, _rule_structs([disallow]), _rule_structs([allow])
        )
        == expected
    )


def test_precedence_via_full_parse():
    """RFC 9309 §2.2.2 end-to-end through the parser: mixed groups,
    most-specific rule wins regardless of file order."""
    txt = (
        "User-agent: *\n"
        "Disallow: /example/\n"
        "Allow: /example/page/\n"
        "Disallow: /example/page/disallowed.gif\n"
    )
    r = parse_robots_py(txt, "anybot")
    dis, alw = _rule_structs(r["disallow"]), _rule_structs(r["allow"])
    assert not robots_allowed_py(HOST + "/example/other", dis, alw)
    assert robots_allowed_py(HOST + "/example/page/x.html", dis, alw)
    assert not robots_allowed_py(
        HOST + "/example/page/disallowed.gif", dis, alw
    )
    assert robots_allowed_py(HOST + "/elsewhere", dis, alw)


def test_no_rules_is_allowed():
    assert robots_allowed_py(HOST + "/anything", [], [])
    # allow rules alone never block
    assert robots_allowed_py(HOST + "/x", [], _rule_structs(["/y"]))
