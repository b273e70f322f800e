"""Ready-made line-model specs mirroring the reference's
conf-available generic parsing models (reference:
source/root/etc/aminer/conf-available/generic/*.py) — a user of the
reference switches by picking the spec dict instead of the model
module. Each reference model is a Sequence/FirstMatch tree of leaf
elements; here each FirstMatch ALTERNATIVE is one whole-line spec
and ``parse_lines_first_match`` picks the winner (``model`` column =
the reference's parser path name).

Implemented: Cron (CronParsingModel.py), Apache access
(ApacheAccessModel.py, combined + common + dash-request variants),
su-session (SuSessionParsingModel.py), the syslog preamble
(SyslogPreambleModel.py) and its composition with a payload model.
The remaining conf-available models (sshd, exim, ntp, rsyslog,
systemd, audispd, ssmtp, tomcat, ulogd, kernel) follow the same
mechanical translation of their Sequence trees — each FirstMatch
alternative (and each optional SUB-SEQUENCE) becomes a whole-line
variant; parity tests drive the REFERENCE model objects on shared
fixtures (tests/test_reference_parity.py).
"""

from __future__ import annotations

_CRON_USER = "0123456789abcdefghijklmnopqrstuvwxyz.-"

# reference CronParsingModel.get_model(): FirstMatch over
# std(exec|pam) and the low-level reload form
CRON_SPECS: dict[str, list[tuple]] = {
    "std_exec": [
        ("sname", "fixed", "CRON["),
        ("pid", "int"),
        ("s0", "fixed", "]: ("),
        ("user", "varbyte", _CRON_USER),
        ("s1", "fixed", ") CMD "),
        ("command", "any"),
    ],
    "std_pam": [
        ("sname", "fixed", "CRON["),
        ("pid", "int"),
        ("s0", "fixed", "]: pam_unix(cron:session): session "),
        ("change", "wordlist", ["opened", "closed"]),
        ("s1", "fixed", " for user "),
        ("user", "varbyte", _CRON_USER),
        ("openby", "optional", ("openby", "fixed", " by (uid=0)")),
    ],
    "low": [
        ("sname", "fixed", "cron["),
        ("pid", "int"),
        ("s0", "fixed", "]: (*system*"),
        ("rname", "delimited", ") RELOAD ("),
        ("s1", "fixed", ") RELOAD ("),
        ("fname", "delimited", ")"),
        ("s2", "fixed", ")"),
    ],
}

_AP_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789._-:"
_AP_USER = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz.-"
_AP_METHODS = ["GET", "POST", "PUT", "HEAD", "DELETE", "CONNECT", "OPTIONS",
               "TRACE", "PATCH"]
# time captured as a string field; parse with
# datetime_model.DateTimeParser("%d/%b/%Y:%H:%M:%S%z") (pc.strptime
# has no %z machine) — see apache_time_seconds below
_AP_PREFIX: list[tuple] = [
    ("host", "varbyte", _AP_ALPHA),
    ("sp0", "fixed", " "),
    ("ident", "varbyte", _AP_ALPHA),
    ("sp1", "fixed", " "),
    ("user", "varbyte", _AP_USER),
    ("sp2", "fixed", " ["),
    ("time", "delimited", "]"),
    ("sp3", "fixed", '] "'),
]
_AP_REQUEST: list[tuple] = [
    ("method", "wordlist", _AP_METHODS),
    ("sp5", "fixed", " "),
    ("request", "delimited", (" ", "\\")),
    ("sp6", "fixed", " "),
    ("version", "delimited", '"'),
]
_AP_STATUS: list[tuple] = [
    ("sp7", "fixed", '" '),
    ("status", "int"),
    ("sp8", "fixed", " "),
    ("size", "int"),
]
_AP_COMBINED: list[tuple] = [
    ("sp9", "fixed", ' "'),
    ("referer", "delimited", ('"', "\\")),
    ("sp10", "fixed", '" "'),
    ("user_agent", "delimited", ('"', "\\")),
    ("sp11", "fixed", '"'),
]

# FirstMatch over whole-line variants: combined log format first
# (strictly longer), then common, then the dash-request forms
APACHE_ACCESS_SPECS: dict[str, list[tuple]] = {
    "combined": _AP_PREFIX + _AP_REQUEST + _AP_STATUS + _AP_COMBINED,
    "common": _AP_PREFIX + _AP_REQUEST + _AP_STATUS,
    "dash_combined": _AP_PREFIX + [("dash", "fixed", "-")] + _AP_STATUS + _AP_COMBINED,
    "dash_common": _AP_PREFIX + [("dash", "fixed", "-")] + _AP_STATUS,
}

_SYSLOG_HOST = "-.01234567890abcdefghijklmnopqrstuvwxyz"


def syslog_preamble_spec() -> list[tuple]:
    """Syslog preamble leaves (reference SyslogPreambleModel):
    '%b %d %H:%M:%S' timestamp captured as a STRING field (the
    missing-year semantics need datetime_model.DateTimeParser with
    start_year, not pc.strptime) + space + hostname."""
    return [
        ("time", "pattern", r"[A-Za-z]{3} [0-9 ]\d \d{2}:\d{2}:\d{2}"),
        ("tsp", "fixed", " "),
        ("host", "varbyte", _SYSLOG_HOST),
        ("hsp", "fixed", " "),
    ]


def syslog_model(payload_spec: list[tuple]) -> list[tuple]:
    """Compose the syslog preamble with a payload model — the
    reference pattern SyslogPreambleModel + service model (e.g.
    CronParsingModel under a syslog head)."""
    return syslog_preamble_spec() + payload_spec


def apache_time_seconds(col):
    """'[%d/%b/%Y:%H:%M:%S%z'-captured time strings → epoch seconds
    (float) via the full DateTimeParser %z machine."""
    from .datetime_model import DateTimeParser

    return DateTimeParser("%d/%b/%Y:%H:%M:%S%z").parse_array(col)["seconds"]


# reference SuSessionParsingModel.get_model(): su[pid]: + FirstMatch
# over su-good (two forms) and pam session open/close; the optional
# " by (uid=N)" SEQUENCE becomes its own whole-line variant (pam_by)
# — combinatorial branches expand to variants rather than nesting
SU_SESSION_SPECS: dict[str, list[tuple]] = {
    "su_good_for": [
        ("sname", "fixed", "su["),
        ("pid", "int"),
        ("s0", "fixed", "]: Successful su for "),
        ("user", "varbyte", _CRON_USER),
        ("s1", "fixed", " by "),
        ("srcuser", "varbyte", _CRON_USER),
    ],
    "su_good_terminal": [
        ("sname", "fixed", "su["),
        ("pid", "int"),
        ("s0", "fixed", "]: + "),
        ("terminal", "delimited", " "),
        ("s1", "fixed", " "),
        ("srcuser", "varbyte", _CRON_USER),
        ("s2", "fixed", ":"),
        ("user", "varbyte", _CRON_USER),
    ],
    "pam_by": [
        ("sname", "fixed", "su["),
        ("pid", "int"),
        ("s0", "fixed", "]: pam_unix(su:session): session "),
        ("change", "wordlist", ["opened", "closed"]),
        ("s1", "fixed", " for user "),
        ("user", "varbyte", _CRON_USER),
        ("s2", "fixed", " by (uid="),
        ("uid", "int"),
        ("s3", "fixed", ")"),
    ],
    "pam": [
        ("sname", "fixed", "su["),
        ("pid", "int"),
        ("s0", "fixed", "]: pam_unix(su:session): session "),
        ("change", "wordlist", ["opened", "closed"]),
        ("s1", "fixed", " for user "),
        ("user", "varbyte", _CRON_USER),
    ],
}
