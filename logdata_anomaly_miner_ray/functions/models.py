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
su-session (SuSessionParsingModel.py), sshd (SshdParsingModel.py,
all ~30 branches / 49 variants), systemd (+logind/tmpfiles), ulogd
(conntrack + quoted key-value records), kernel (KernelMsg), ntp,
tomcat, ssmtp, rsyslog (with its optional instance-number heads),
the syslog preamble (SyslogPreambleModel.py) and its composition
with a payload model, and the aminer's own JSON event model
(AminerParsingModel → aminer_event_schema(), a JsonSchema with
optional prefix '_'), exim (EximGenericParsingModel.py, 44
variants), audispd (AudispdParsingModel.py, 41 structured + 99
catch-all variants) and the AIT-LDS-specific SyslogParsingModel
(SYSLOG_AIT_SPECS, 135 variants: dovecot/horde/account-tool/daemon
branches) — ALL 16 conf-available generic models. Each FirstMatch
alternative (and each optional SUB-SEQUENCE with secondary
captures) becomes a whole-line variant; parity + mutation-fuzz
tests drive the REFERENCE model objects on shared fixtures
(tests/test_reference_parity.py).
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



def _tz_suffix_fragment() -> str:
    """RE2 fragment of the reference %z trailing-timezone machine
    (DateTimeModelElement.py:347-413): optional space + zone name
    from the shared table (numeric offset allowed only after
    UTC/GMT), or a bare [+-] offset of 1-4 digits / HH:MM (with or
    without the leading space), optional trailing Z."""
    import re as _re

    from .datetime_model import TIMEZONE_OFFSETS

    names = "|".join(
        _re.escape(n) for n in sorted(TIMEZONE_OFFSETS, key=len, reverse=True)
    )
    off = r"[+-](?:\d{2}:\d{2}|\d{1,4})"
    return (
        "(?:"
        f" (?:UTC|GMT)(?:{off})?"
        f"| (?:{names})"
        f"| {off}"
        f"|{off}"
        ")?Z?"
    )


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
    # date shape + the reference's %z suffix machine as a fragment
    # (zone names from the shared TIMEZONE_OFFSETS table; numeric
    # offsets bare or after UTC/GMT only, 1-4 digits or HH:MM —
    # DateTimeModelElement.py:347-413). Field VALUE ranges (day 99)
    # are post-parse via apache_time_seconds, the one documented
    # superset of this translation.
    ("time", "pattern",
     r"\d{2}/(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)/"
     r"\d{4}:\d{2}:\d{2}:\d{2}" + _tz_suffix_fragment()),
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


# ---------------------------------------------------------------------------
# SshdParsingModel (reference conf-available/generic/SshdParsingModel.py,
# the canonical AMiner demo model): sshd[pid]: + FirstMatch over ~30
# message branches. Variant order FOLLOWS the reference branch order
# (first-match fidelity). Translation notes:
# - nested (ipv4 | ipv6) FirstMatches become one `ipany` pattern leaf
#   captured as a STRING (the reference yields ints; keyed stages can
#   post-parse with parse_ipv4/parse_ipv6);
# - multi-char delimiters (" from ", " [preauth]") have no RE2
#   char-class form — a lazy `.+?` before the fixed literal mirrors
#   the reference's first-occurrence cut on well-formed lines;
# - optional SUB-SEQUENCES expand to ordered whole-line variants
#   (see SU_SESSION_SPECS note).
# ---------------------------------------------------------------------------

_SSHD_HEAD: list[tuple] = [
    ("sname", "fixed", "sshd["),
    ("pid", "int"),
    ("s0", "fixed", "]: "),
]
_IP4_PAT = r"(?:(?:25[0-5]|2[0-4]\d|[01]?\d?\d)\.){3}(?:25[0-5]|2[0-4]\d|[01]?\d?\d)"
_IPANY_PAT = _IP4_PAT + r"|[0-9A-Fa-f:]{2,39}"
_B64 = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ+/:"


def _sshd(body: list[tuple]) -> list[tuple]:
    return _SSHD_HEAD + body


SSHD_SPECS: dict[str, list[tuple]] = {
    "accepted_key_ca": _sshd([
        ("m0", "fixed", "Accepted publickey for "),
        ("user", "varbyte", _CRON_USER),
        ("m1", "fixed", " from "),
        ("clientip", "ipv4"),
        ("m2", "fixed", " port "),
        ("port", "int"),
        ("m3", "fixed", " ssh2: "),
        ("asym_algorithm", "delimited", " "),
        ("m4", "fixed", " "),
        ("fingerprint", "varbyte", _B64),
        ("m5", "fixed", " ID "),
        ("id", "delimited", " "),
        ("m6", "fixed", " (serial "),
        ("serial", "int"),
        ("m7", "fixed", ") CA "),
        ("algorithm_details", "pattern", r".+"),
    ]),
    "accepted_key": _sshd([
        ("m0", "fixed", "Accepted publickey for "),
        ("user", "varbyte", _CRON_USER),
        ("m1", "fixed", " from "),
        ("clientip", "ipv4"),
        ("m2", "fixed", " port "),
        ("port", "int"),
        ("m3", "fixed", " ssh2: "),
        ("asym_algorithm", "delimited", " "),
        ("m4", "fixed", " "),
        ("fingerprint", "varbyte", _B64),
    ]),
    "btmp_perm": _sshd([
        ("m0", "fixed", "Excess permission or bad ownership on file /var/log/btmp"),
    ]),
    "close_sess": _sshd([
        ("m0", "fixed", "Close session: user "),
        ("user", "varbyte", _CRON_USER),
        ("m1", "fixed", " from "),
        ("clientip", "ipv4"),
        ("m2", "fixed", " port "),
        ("port", "int"),
        ("m3", "fixed", " id "),
        ("userid", "int"),
    ]),
    "closing": _sshd([
        ("m0", "fixed", "Closing connection to "),
        ("clientip", "ipv4"),
        ("m1", "fixed", " port "),
        ("port", "int"),
    ]),
    "closed_ip": _sshd([
        ("m0", "fixed", "Connection closed by "),
        ("clientip", "ipv4"),
    ]),
    "closed_user": _sshd([
        ("m0", "fixed", "Connection closed by "),
        ("user_type", "wordlist", ["authenticating", "invalid"]),
        ("m1", "fixed", " user "),
        ("user", "delimited", " "),
        ("m2", "fixed", " "),
        ("ip", "pattern", _IPANY_PAT),
        ("m3", "fixed", " port "),
        ("port", "int"),
        ("m4", "fixed", " [preauth]"),
    ]),
    "connect": _sshd([
        ("m0", "fixed", "Connection from "),
        ("clientip", "ipv4"),
        ("m1", "fixed", " port "),
        ("port", "int"),
        ("m2", "fixed", " on "),
        ("serverip", "ipv4"),
        ("m3", "fixed", " port "),
        ("sport", "int"),
    ]),
    "disconnectreq": _sshd([
        ("m0", "fixed", "Received disconnect from "),
        ("clientip", "ipv4"),
        ("m1", "fixed", " port "),
        ("port", "int"),
        ("m2", "fixed", ":"),
        ("session", "int"),
        ("m3", "fixed", ": "),
        ("reason", "wordlist", ["disconnected by user"]),
    ]),
    "disconnected": _sshd([
        ("m0", "fixed", "Disconnected from "),
        ("clientip", "ipv4"),
        ("m1", "fixed", " port "),
        ("port", "int"),
    ]),
    "error_bind": _sshd([
        ("m0", "fixed", "error: bind: Cannot assign requested address"),
    ]),
    "error_max_auth": _sshd([
        ("m0", "fixed", "error: maximum authentication attempts exceeded for "),
        ("invalid", "optional", ("invalid", "fixed", "invalid user ")),
        ("user", "delimited", " "),
        ("m1", "fixed", " from "),
        ("from_ip", "pattern", _IPANY_PAT),
        ("m2", "fixed", " port "),
        ("port", "int"),
        ("m3", "fixed", " ssh2 [preauth]"),
    ]),
    "error_cert_exp": _sshd([
        ("m0", "fixed", "error: Certificate invalid: expired"),
    ]),
    "error_cert_not_yet_valid": _sshd([
        ("m0", "fixed", "error: Certificate invalid: not yet valid"),
    ]),
    "error_cert_not_listed_principal": _sshd([
        ("m0", "fixed", "error: Certificate invalid: name is not a listed principal"),
    ]),
    "error_refused_by_options": _sshd([
        ("m0", "fixed", "error: Refused by certificate options"),
    ]),
    "error_channel_setup": _sshd([
        ("m0", "fixed", "error: channel_setup_fwd_listener: cannot listen to port: "),
        ("port", "int"),
    ]),
    "error_auth_key": _sshd([
        ("m0", "fixed", "error: Authentication key "),
        ("asym_algorithm", "delimited", " "),
        ("m1", "fixed", " "),
        ("hash", "delimited", " "),
        ("m2", "fixed", " revoked by file "),
        ("file", "pattern", r".+"),
    ]),
    "error_load_key": _sshd([
        ("m0", "fixed", "error: Could not load host key: "),
        ("file", "pattern", r".+"),
    ]),
    "ident_missing": _sshd([
        ("m0", "fixed", "Did not receive identification string from "),
        ("clientip", "ipv4"),
    ]),
    "invalid_user": _sshd([
        ("m0", "fixed", "Invalid user "),
        ("user", "pattern", r".+?"),
        ("m1", "fixed", " from "),
        ("from_ip", "pattern", _IPANY_PAT),
        ("m2", "fixed", " port "),
        ("port", "int"),
    ]),
    "invalid_user_auth_req": _sshd([
        ("m0", "fixed", "input_userauth_request: invalid user "),
        ("user", "pattern", r".+?"),
        ("m1", "fixed", " [preauth]"),
    ]),
    "postppk": _sshd([
        ("m0", "fixed", "Postponed publickey for "),
        ("user", "varbyte", _CRON_USER),
        ("m1", "fixed", " from "),
        ("clientip", "ipv4"),
        ("m2", "fixed", " port "),
        ("port", "int"),
        ("m3", "fixed", " ssh2 [preauth]"),
    ]),
    "readerr": _sshd([
        ("m0", "fixed", "Read error from remote host "),
        ("clientip", "ipv4"),
        ("m1", "fixed", ": Connection timed out"),
    ]),
    "disconnect_user": _sshd([
        ("m0", "fixed", "Received disconnect from "),
        ("from_ip", "pattern", _IPANY_PAT),
        ("m1", "fixed", ": 11: "),
        ("reason", "wordlist", ["disconnected by user"]),
    ]),
    "disconnect_msg": _sshd([
        ("m0", "fixed", "Received disconnect from "),
        ("from_ip", "pattern", _IPANY_PAT),
        ("m1", "fixed", ": 11: "),
        ("msg", "pattern", r".+?"),
        ("m2", "fixed", " [preauth]"),
    ]),
    "signal": _sshd([
        ("m0", "fixed", "Received signal "),
        ("signal", "int"),
        ("m1", "fixed", "; terminating."),
    ]),
    "server": _sshd([
        ("m0", "fixed", "Server listening on "),
        ("serverip", "delimited", " "),
        ("m1", "fixed", " port "),
        ("port", "int"),
        ("m2", "fixed", "."),
    ]),
    "oom_adjust": _sshd([
        ("m0", "fixed", "Set /proc/self/oom_score_adj "),
        ("from0", "optional", ("from0", "fixed", "from 0 ")),
        ("m1", "fixed", "to "),
        ("newval", "sint"),
    ]),
    "session_start_shell": _sshd([
        ("m0", "fixed", "Starting session: shell on "),
        ("terminal", "delimited", " "),
        ("m1", "fixed", " for "),
        ("user", "varbyte", _CRON_USER),
        ("m2", "fixed", " from "),
        ("clientip", "ipv4"),
        ("m3", "fixed", " port "),
        ("port", "int"),
        ("mi", "optional", ("mi", "fixed", " id ")),
        ("id", "optional", ("id", "int")),
    ]),
    "session_start_subsystem": _sshd([
        ("m0", "fixed", 'Starting session: subsystem "sftp" for '),
        ("user", "varbyte", _CRON_USER),
        ("m1", "fixed", " from "),
        ("clientip", "ipv4"),
        ("m2", "fixed", " port "),
        ("port", "int"),
        ("mi", "optional", ("mi", "fixed", " id ")),
        ("id", "optional", ("id", "int")),
    ]),
    "session_start_forced": _sshd([
        ("m0", "fixed", 'Starting session: forced-command (key-option) "'),
        ("command", "pattern", r".+?"),
        ("m1", "fixed", '" for '),
        ("user", "varbyte", _CRON_USER),
        ("m2", "fixed", " from "),
        ("clientip", "ipv4"),
        ("m3", "fixed", " port "),
        ("port", "int"),
        ("mi", "optional", ("mi", "fixed", " id ")),
        ("id", "optional", ("id", "int")),
    ]),
    "transferred": _sshd([
        ("m0", "fixed", "Transferred: sent "),
        ("sent", "int"),
        ("m1", "fixed", ", received "),
        ("received", "int"),
        ("m2", "fixed", " bytes"),
    ]),
    "pam": _sshd([
        ("m0", "fixed", "pam_unix(sshd:session): session "),
        ("change", "wordlist", ["opened", "closed"]),
        ("m1", "fixed", " for user "),
        ("user", "varbyte", _CRON_USER),
        ("openby", "optional", ("openby", "fixed", " by (uid=0)")),
    ]),
    "child": _sshd([
        ("m0", "fixed", "User child is on pid "),
        ("childpid", "int"),
    ]),
    "failed_accept": _sshd([
        ("verdict", "wordlist", ["Failed ", "Accepted "]),
        ("type", "wordlist", ["password", "none", "publickey"]),
        ("m1", "fixed", " for "),
        ("invalid", "optional", ("invalid", "fixed", "invalid user ")),
        ("user", "delimited", " "),
        ("m2", "fixed", " from "),
        ("from_ip", "pattern", _IPANY_PAT),
        ("m3", "fixed", " port "),
        ("port", "int"),
        # \D start = the reference's POSSESSIVE DecimalInteger: the
        # port eats every digit, so the AnyByte service can never
        # begin with one (regex backtracking would otherwise split
        # "6019" into port 601 + service "9")
        ("service", "pattern", r"\D.*"),
    ]),
    "disconnecting": _sshd([
        ("m0", "fixed", "Disconnecting "),
        ("type", "wordlist", ["authenticating", "invalid"]),
        ("m1", "fixed", " user "),
        ("user", "delimited", " "),
        ("m2", "fixed", " "),
        ("ip", "ipv4"),
        ("m3", "fixed", " port "),
        ("port", "int"),
        ("m4", "fixed", ": Too many authentication failures [preauth]"),
    ]),
    "fatal": _sshd([
        ("m0", "fixed", "fatal: Timeout before authentication for "),
        ("ip", "ipv4"),
        ("m1", "fixed", " port "),
        ("port", "int"),
    ]),
    "cert_auth": _sshd([
        ("m0", "fixed", "cert: Authentication tried for "),
        ("user", "delimited", " "),
        ("m1", "fixed", " with valid certificate but not from a permitted source address ("),
        ("ip", "ipv4"),
        ("m2", "fixed", ")."),
    ]),
    "change_root_dir": _sshd([
        ("m0", "fixed", 'Changed root directory to "'),
        ("root_dir", "delimited", '"'),
        ("m1", "fixed", '"'),
    ]),
    "subsystem_request": _sshd([
        ("m0", "fixed", "subsystem request for sftp"),
    ]),
    "conn_write_poll": _sshd([
        ("m0", "fixed", "packet_write_poll: Connection from "),
        ("from_ip", "ipv4"),
        ("m1", "fixed", " port "),
        ("port", "int"),
        ("m2", "fixed", ": Host is down"),
    ]),
    "debug_keepalive": _sshd([
        ("m0", "fixed", "debug"),
        ("debug_num", "int"),
        ("m1", "fixed", ": Got "),
        ("num1", "int"),
        ("m2", "fixed", "/"),
        ("num2", "int"),
        ("m3", "fixed", " for keepalive"),
    ]),
    "debug_channel": _sshd([
        ("m0", "fixed", "debug"),
        ("debug_num", "int"),
        ("m1", "fixed", ": channel "),
        ("channel_num", "int"),
        ("m2", "fixed", ": request "),
        ("mail", "delimited", " "),
        ("m3", "fixed", " confirm "),
        ("num", "int"),
    ]),
    "debug_send_packet": _sshd([
        ("m0", "fixed", "debug"),
        ("debug_num", "int"),
        ("m1", "fixed", ": send packet: type "),
        ("packet_type", "int"),
    ]),
    "debug_receive_packet": _sshd([
        ("m0", "fixed", "debug"),
        ("debug_num", "int"),
        ("m1", "fixed", ": receive packet: type "),
        ("packet_type", "int"),
    ]),
    "debug_do_cleanup": _sshd([
        ("m0", "fixed", "debug"),
        ("debug_num", "int"),
        ("m1", "fixed", ": do_cleanup"),
    ]),
    "debug_pty_cleanup": _sshd([
        ("m0", "fixed", "debug"),
        ("debug_num", "int"),
        ("m1", "fixed", ": session_pty_cleanup: session "),
        ("sess_num", "int"),
        ("m2", "fixed", " release "),
        ("file", "pattern", r".+"),
    ]),
    "pam_succeed_if": _sshd([
        ("m0", "fixed", 'pam_succeed_if(sshd:auth): requirement "uid >= '),
        ("uid", "int"),
        ("m1", "fixed", '" not met by user "'),
        ("user", "delimited", '"'),
        ("m2", "fixed", '"'),
    ]),
}


# ---------------------------------------------------------------------------
# SystemdParsingModel (reference conf-available/generic/
# SystemdParsingModel.py): FirstMatch over three daemons
# (systemd[pid], systemd-logind[pid], systemd-tmpfiles[pid]), each
# with its own message FirstMatch. Branch order follows the
# reference; the apt-daily-timer optional hours sub-sequence expands
# to an ordered variant pair.
# ---------------------------------------------------------------------------

def _systemd(body: list[tuple]) -> list[tuple]:
    return [("sname", "fixed", "systemd["), ("pid", "int"),
            ("s0", "fixed", "]: ")] + body


def _logind(body: list[tuple]) -> list[tuple]:
    return [("sname", "fixed", "systemd-logind["), ("pid", "int"),
            ("s0", "fixed", "]: ")] + body


_LOGIND_USER = "0123456789abcdefghijklmnopqrstuvwxyz-_"

SYSTEMD_SPECS: dict[str, list[tuple]] = {
    "apt_daily_start": _systemd([
        ("m0", "fixed", "Starting Daily apt upgrade and clean activities..."),
    ]),
    "apt_daily_started": _systemd([
        ("m0", "fixed", "Started Daily apt upgrade and clean activities."),
    ]),
    "apt_daily_finished": _systemd([
        ("m0", "fixed", "Finished Daily apt upgrade and clean activities."),
    ]),
    "service_succeeded": _systemd([
        ("service", "delimited", " "),
        ("m0", "fixed", " Succeeded."),
    ]),
    "clean_php": _systemd([
        ("m0", "fixed", "Finished Clean php session files."),
    ]),
    "finished_logrotate": _systemd([
        ("m0", "fixed", "Finished Rotate log files."),
    ]),
    "finished_man_db_daily": _systemd([
        ("m0", "fixed", "Finished Daily man-db regeneration."),
    ]),
    "finished_ubuntu_advantages": _systemd([
        ("m0", "fixed", "Finished Ubuntu Advantage APT and MOTD Messages."),
    ]),
    "finished_refresh": _systemd([
        ("m0", "fixed", "Finished Refresh fwupd metadata and update motd."),
    ]),
    "finished_daily_apt": _systemd([
        ("m0", "fixed", "Finished Daily apt download activities."),
    ]),
    "apt_daily_timer_h": _systemd([
        ("m0", "fixed", "apt-daily.timer: Adding "),
        ("hours", "int"),
        ("m1", "fixed", "h "),
        ("minutes", "int"),
        ("m2", "fixed", "min "),
        ("seconds", "float"),
        ("m3", "fixed", "s random time."),
    ]),
    "apt_daily_timer": _systemd([
        ("m0", "fixed", "apt-daily.timer: Adding "),
        ("minutes", "int"),
        ("m1", "fixed", "min "),
        ("seconds", "float"),
        ("m2", "fixed", "s random time."),
    ]),
    "tmp_file_cleanup": _systemd([
        ("m0", "fixed", "Starting Cleanup of Temporary Directories..."),
    ]),
    "tmp_file_cleanup_started": _systemd([
        ("m0", "fixed", "Started Cleanup of Temporary Directories."),
    ]),
    "killing_process": _systemd([
        ("service", "delimited", ":"),
        ("m0", "fixed", ": Killing process "),
        ("kpid", "int"),
        ("m1", "fixed", " (update-notifier) with signal SIGKILL."),
    ]),
    "starting": _systemd([
        ("m0", "fixed", "Starting "),
        ("service", "delimited", "."),
        ("m1", "fixed", "..."),
    ]),
    "started": _systemd([
        ("m0", "fixed", "Started "),
        ("service", "delimited", "."),
        ("m1", "fixed", "."),
    ]),
    "reloading": _systemd([
        ("m0", "fixed", "Reloading."),
    ]),
    "logind_new_session": _logind([
        ("m0", "fixed", "New session "),
        ("session", "int"),
        ("m1", "fixed", " of user "),
        ("user", "varbyte", _LOGIND_USER),
        ("m2", "fixed", "."),
    ]),
    "logind_removed_session": _logind([
        ("m0", "fixed", "Removed session "),
        ("session", "int"),
        ("m1", "fixed", "."),
    ]),
    "logind_logged_out": _logind([
        ("m0", "fixed", "Session "),
        ("session", "int"),
        ("m1", "fixed", " logged out. Waiting for processes to exit."),
    ]),
    "logind_failed_abandon": _logind([
        ("m0", "fixed", "Failed to abandon session scope: Transport endpoint is not connected"),
    ]),
    "tmpfiles_duplicate": [
        ("sname", "fixed", "systemd-tmpfiles["),
        ("pid", "int"),
        ("s0", "fixed", ']: [/usr/lib/tmpfiles.d/var.conf:14] Duplicate line for path "'),
        ("path", "pattern", r".+?"),
        ("m1", "fixed", '", ignoring.'),
    ],
}


# ---------------------------------------------------------------------------
# UlogdParsingModel (reference conf-available/generic/
# UlogdParsingModel.py): ulogd[pid]: + FirstMatch over pluginstance /
# netfilter-conntrack / quoted key="value" firewall records.
# ---------------------------------------------------------------------------

def _ulogd(body: list[tuple]) -> list[tuple]:
    return [("sname", "fixed", "ulogd["), ("pid", "int"),
            ("s0", "fixed", "]: ")] + body


def _quoted_kv(keys: list[str]) -> list[tuple]:
    """id="<int>" k="v" ... run — the reference's 41-leaf quoted
    sequence, generated (id is the only integer leaf)."""
    out: list[tuple] = [("q0", "fixed", 'id="'), ("id", "int")]
    for i, k in enumerate(keys):
        out.append((f"q{i + 1}", "fixed", f'" {k}="'))
        out.append((k, "delimited", '"'))
    out.append((f"q{len(keys) + 1}", "fixed", '"'))
    return out


_NFCT_SIDE = lambda p, lead: [  # noqa: E731 — local table builder
    (f"{p}srcip", "ipv4"),
    (f"n{p}1", "fixed", " DST="),
    (f"{p}dstip", "ipv4"),
    (f"n{p}2", "fixed", " PROTO="),
    (f"{p}proto", "wordlist", ["TCP", "UDP"]),
    (f"n{p}3", "fixed", " SPT="),
    (f"{p}spt", "int"),
    (f"n{p}4", "fixed", " DPT="),
    (f"{p}dpt", "int"),
    (f"n{p}5", "fixed", " PKTS="),
    (f"{p}pkts", "int"),
    (f"n{p}6", "fixed", " BYTES="),
    (f"{p}bytes", "int"),
]

_ULOGD_KV_KEYS = [
    "severity", "sys", "sub", "name", "action", "fwrule", "initf",
    "srcmac", "dstmac", "srcip", "dstip", "proto", "length", "tos",
    "prec", "ttl", "srcport", "dstport", "tcpflags",
]

ULOGD_SPECS: dict[str, list[tuple]] = {
    "build_stack": _ulogd([
        ("m0", "fixed", 'building new pluginstance stack: "'),
        ("stack", "delimited", '"'),
        ("m1", "fixed", '"'),
    ]),
    "nfct_event_tail": _ulogd(
        [("m0", "fixed", "[DESTROY] ORIG: SRC=")] + _NFCT_SIDE("o", "")
        + [("mr", "fixed", " , REPLY: SRC=")] + _NFCT_SIDE("r", "")
        + [("tail", "fixed", " ")]
    ),
    "nfct_event": _ulogd(
        [("m0", "fixed", "[DESTROY] ORIG: SRC=")] + _NFCT_SIDE("o", "")
        + [("mr", "fixed", " , REPLY: SRC=")] + _NFCT_SIDE("r", "")
    ),
    "nfct_plugin": _ulogd([
        ("m0", "fixed", "NFCT plugin working in event mode"),
    ]),
    "reopen": _ulogd([("m0", "fixed", "reopening capture file")]),
    "signal": _ulogd([
        ("m0", "fixed", "signal received, calling pluginstances"),
    ]),
    "uidchange": _ulogd([("m0", "fixed", "Changing UID / GID")]),
    "kv": _ulogd(_quoted_kv(_ULOGD_KV_KEYS)),
}


# ---------------------------------------------------------------------------
# KernelMsgParsingModel (reference conf-available/generic/
# KernelMsgParsingModel.py): "kernel: " + an optional timestamp block
# (translated verbatim, including the reference's odd leading "]")
# + FirstMatch over martian / ll-header / catch-all.
# ---------------------------------------------------------------------------

_KERNEL_TS: list[tuple] = [
    ("k0", "fixed", "]"),
    ("timestamp", "delimited", "]"),
    ("k1", "fixed", "] "),
]


def _kernel(body: list[tuple], ts: bool) -> list[tuple]:
    return ([("sname", "fixed", "kernel: ")] + (_KERNEL_TS if ts else [])
            + body)


_KERNEL_BRANCHES: dict[str, list[tuple]] = {
    "ipv4_martian": [
        ("m0", "fixed", "IPv4: martian "),
        ("direction", "wordlist", ["source", "destination"]),
        ("m1", "fixed", " "),
        ("destination", "ipv4"),
        ("m2", "fixed", " from "),
        ("source", "ipv4"),
        ("m3", "fixed", ", on dev "),
        ("interface", "pattern", r".+"),
    ],
    "net_llheader": [
        ("m0", "fixed", "ll header: "),
        ("data", "pattern", r".+"),
    ],
    "unparsed": [("data", "pattern", r".+")],
}

KERNEL_SPECS: dict[str, list[tuple]] = {}
for _ts in (True, False):
    for _bn, _body in _KERNEL_BRANCHES.items():
        KERNEL_SPECS[f"{_bn}{'_ts' if _ts else ''}"] = _kernel(_body, _ts)


# ---------------------------------------------------------------------------
# NtpParsingModel (reference conf-available/generic/NtpParsingModel.py):
# ntpd[pid]: + FirstMatch over listen / leapsecond / fixed notices.
# The nested (ipv4 | ipv6-string | "[::]") address FirstMatches expand
# to variants; the %Y-%m-%dT%H:%M:%SZ expire dates are datetime leaves.
# ---------------------------------------------------------------------------

def _ntpd(body: list[tuple]) -> list[tuple]:
    return [("sname", "fixed", "ntpd["), ("pid", "int"),
            ("s0", "fixed", "]: ")] + body


_NTP_IF = "0123456789abcdefghijklmnopqrstuvwxyz."

NTP_SPECS: dict[str, list[tuple]] = {
    "exit": _ntpd([
        ("m0", "fixed", "ntpd exiting on signal "),
        ("signal", "int"),
    ]),
    "listen_drop_v4": _ntpd([
        ("m0", "fixed", "Listen and drop on "),
        ("fd", "int"),
        ("m1", "fixed", " "),
        ("interface", "varbyte", _NTP_IF),
        ("m2", "fixed", " "),
        ("address", "ipv4"),
        ("udp", "wordlist", [" UDP 123", ":123"]),
    ]),
    "listen_drop_v6": _ntpd([
        ("m0", "fixed", "Listen and drop on "),
        ("fd", "int"),
        ("m1", "fixed", " "),
        ("interface", "varbyte", _NTP_IF),
        ("m2", "fixed", " "),
        ("address", "delimited", " "),
        # the reference's Delimited address is POSSESSIVE (eats to
        # the space), so its ":123" alternative is unreachable after
        # a v6 address — only the spaced form survives
        ("udp", "fixed", " UDP 123"),
    ]),
    "listen_normal": _ntpd([
        ("m0", "fixed", "Listen normally on "),
        ("fd", "int"),
        ("m1", "fixed", " "),
        ("interface", "varbyte", _NTP_IF),
        ("m2", "fixed", " "),
        ("ip", "ipv4"),
        ("udp", "wordlist", [":123", " UDP 123"]),
    ]),
    "listen_routing": _ntpd([
        ("m0", "fixed", "Listening on routing socket on fd #"),
        ("fd", "int"),
        ("m1", "fixed", " for interface updates"),
    ]),
    "soliciting_pool": _ntpd([
        ("m0", "fixed", "Soliciting pool server "),
        ("pool_server_ip", "ipv4"),
    ]),
    "starting": _ntpd([
        ("m0", "fixed", "ntpd "),
        ("version", "delimited", " "),
        ("m1", "fixed", " (1): Starting"),
    ]),
    "no_root": _ntpd([
        ("m0", "fixed", "must be run as root, not uid "),
        ("uid", "int"),
    ]),
    "leapsecond_good": _ntpd([
        ("m0", "fixed", "leapsecond file ('"),
        ("file", "delimited", "'"),
        ("m1", "fixed", "'): good hash signature"),
    ]),
    "leapsecond_loaded": _ntpd([
        ("m0", "fixed", "leapsecond file ('"),
        ("file", "delimited", "'"),
        ("m1", "fixed", "'): loaded, expire="),
        ("expire", "datetime", "%Y-%m-%dT%H:%M:%SZ"),
        ("m2", "fixed", " last="),
        ("last", "datetime", "%Y-%m-%dT%H:%M:%SZ"),
        ("m3", "fixed", " ofs="),
        ("ofs", "int"),
    ]),
    "unable_to_bind": _ntpd([
        ("m0", "fixed", "unable to bind to wildcard address :: - another process may be running - EXITING"),
    ]),
    "new_interfaces": _ntpd([
        ("m0", "fixed", "new interface(s) found: waking up resolver"),
    ]),
    "ntp_io": _ntpd([
        ("m0", "fixed", "ntp_io: estimated max descriptors: 1024, initial socket boundary: 16"),
    ]),
    "peers_refreshed": _ntpd([("m0", "fixed", "peers refreshed")]),
    "log_file": _ntpd([
        ("m0", "fixed", "logging to file /var/log/ntplog"),
    ]),
    "command_line": _ntpd([("m0", "fixed", "Command line: ntpd")]),
    "precision": _ntpd([
        ("m0", "fixed", "proto: precision = "),
        ("precision", "float"),
        ("m1", "fixed", " usec ("),
        ("usec", "sint"),
        ("m2", "fixed", ")"),
    ]),
}


# ---------------------------------------------------------------------------
# TomcatParsingModel / SsmtpParsingModel / RsyslogParsingModel
# (reference conf-available/generic/): small service models.
# Rsyslog's head ("rsyslogd" + optional instance number, bare or
# dash-prefixed) expands to three head variants per message branch.
# ---------------------------------------------------------------------------

TOMCAT_SPECS: dict[str, list[tuple]] = {
    name: [("sname", "fixed", "tomcat7["), ("pid", "int"),
           ("s0", "fixed", "]: ")] + body
    for name, body in {
        "start": [("m0", "fixed", " * Starting Tomcat servlet engine tomcat7")],
        "stop": [("m0", "fixed", " * Stopping Tomcat servlet engine tomcat7")],
        "done": [("m0", "fixed", "   ...done.")],
        "unparsed": [("data", "pattern", r".+")],
    }.items()
}

SSMTP_SPECS: dict[str, list[tuple]] = {
    "sent_full": [
        ("sname", "fixed", "sSMTP["),
        ("pid", "int"),
        ("s0", "fixed", "]: Sent mail for "),
        ("to_addr", "delimited", " ("),
        ("s1", "fixed", " ("),
        ("status", "delimited", ") uid="),
        ("s2", "fixed", ") uid="),
        ("uid", "int"),
        ("s3", "fixed", " username="),
        ("username", "delimited", " outbytes="),
        ("s4", "fixed", " outbytes="),
        ("bytes", "int"),
    ],
    "sent_short": [
        ("sname", "fixed", "sSMTP["),
        ("pid", "int"),
        ("s0", "fixed", "]: "),
        ("program", "delimited", " "),
        ("s1", "fixed", " sent mail for "),
        ("user", "pattern", r".+"),
    ],
}

_RSYSLOG_BRANCHES: dict[str, list[tuple]] = {
    "gidchange": [
        ("m0", "fixed", "rsyslogd's groupid changed to "),
        ("gid", "int"),
    ],
    "statechange": [
        ("m0", "fixed", '[origin software="rsyslogd" swVersion="'),
        ("version", "delimited", '"'),
        ("m1", "fixed", '" x-pid="'),
        ("xpid", "int"),
        ("xinfo", "wordlist", ['" x-info="https://www.rsyslog.com"] ',
                                '" x-info="http://www.rsyslog.com"] ']),
        ("type", "wordlist", ["rsyslogd was HUPed", "start"]),
    ],
    "uidchange": [
        ("m0", "fixed", "rsyslogd's userid changed to "),
        ("uid", "int"),
    ],
    "action_resumed": [
        ("m0", "fixed", "action '"),
        ("action", "delimited", "'"),
        ("m1", "fixed", "' resumed (module '"),
        ("module", "delimited", "'"),
        ("m2", "fixed", "') [try http://www.rsyslog.com/e/"),
        ("number", "int"),
        ("m3", "fixed", " ]"),
    ],
    "action_suspended": [
        ("m0", "fixed", "action '"),
        ("action", "delimited", "'"),
        ("m1", "fixed", "' suspended, next retry is "),
        ("dayname", "delimited", " "),
        ("m2", "fixed", " "),
        ("dtme", "datetime", "%b %d %H:%M:%S %Y"),
        ("m3", "fixed", " [try http://www.rsyslog.com/e/"),
        ("number", "int"),
        ("m4", "fixed", " ]"),
    ],
    "cmd": [
        ("m0", "fixed", "command '"),
        ("command", "delimited", "'"),
        ("m1", "fixed", "' is currently not permitted - did you already "
                         "set it via a RainerScript command (v6+ config)? ["),
        ("version", "delimited", "]"),
        ("m2", "fixed", "]"),
    ],
}

_RSYSLOG_HEADS: list[tuple[str, list[tuple]]] = [
    ("n", [("sname", "fixed", "rsyslogd"), ("inst", "int"),
           ("h0", "fixed", ": ")]),
    ("dn", [("sname", "fixed", "rsyslogd-"), ("inst", "int"),
            ("h0", "fixed", ": ")]),
    ("", [("sname", "fixed", "rsyslogd: ")]),
]

RSYSLOG_SPECS: dict[str, list[tuple]] = {}
for _hk, _head in _RSYSLOG_HEADS:
    for _bn, _body in _RSYSLOG_BRANCHES.items():
        RSYSLOG_SPECS[f"{_bn}{('_' + _hk) if _hk else ''}"] = _head + _body


def aminer_event_schema():
    """AminerParsingModel (reference conf-available/generic/
    AminerParsingModel.py — a JsonModelElement over the aminer's own
    JSON event output, optional-key prefix "_") translated to a
    JsonSchema spec. Leaf mapping: DecimalInteger→int, DecimalFloat→
    float, true/false wordlists→bool, every string-shaped element
    (VariableByte / wordlist / structured Sequence text like the
    correlation Rule grammar)→str — per-string alphabet/grammar
    validation is the documented approximation; structural semantics
    (required vs optional keys, nullability, ALLOW_ALL / ALLOW_ALL_KEYS
    / EMPTY_ARRAY markers, list element typing, unexpected-key
    rejection) carry over exactly."""
    from .parsing import JsonSchema

    feature = {
        "Rule": {"type": str, "path": str, "_value": str,
                 "match_action": str, "log_total": int, "log_success": int},
        "Index": int, "CreationTime": float, "LastTriggerTime": float,
        "TriggerCount": int,
    }
    histogram = {
        "TotalElements": int, "BinnedElements": int,
        "HasOutlierBinsFlag": bool,
        "Bins": {"ALLOW_ALL_KEYS": int},
        "BinDefinition": {
            "Type": str, "LowerLimit": int, "BinSize": int, "BinCount": int,
            "OutlierBinsFlag": bool, "BinNames": [str],
            "ExpectedBinRatio": float, "_ModuloValue": int, "_TimeUnit": int,
        },
        "PropertyPath": str,
    }
    return JsonSchema({
        "_AnalysisComponent": {
            # reference: FirstMatch(int | FixedData "null") — json
            # null is REJECTED (no nullable prefix); the literal
            # string "null" alternative is the one leaf-FirstMatch
            # corner this translation drops (plain int here)
            "AnalysisComponentIdentifier": int,
            "AnalysisComponentType": str,
            "AnalysisComponentName": str,
            "Message": str,
            "_PersistenceFileName": str,
            "_TrainingMode": bool,
            "_AffectedLogAtomPaths": [str],
            "_AffectedLogAtomValues": [str],
            "_Metadata": {
                "TimeFirstOccurrence": float,
                "TimeLastOccurrence": float,
                "NumberOfOccurrences": int,
            },
            "_ParsedLogAtom": {"ALLOW_ALL_KEYS": str},
            "_FeatureList": [feature],
            "_AnalysisStatus": str,
            "_TotalRecords": int,
            "_HistogramData": [histogram],
            "_ReportInterval": int,
            "_ResetAfterReportFlag": bool,
            "_MissingPaths": [str],
            "_AnomalyScores": [{
                "Path": str,
                "AnalysisData": {
                    "New": {"N": int, "Avg": float, "Var": float},
                    "Old": {"N": int, "Avg": float, "Var": float},
                },
            }],
            "_MinBinElements": int,
            "_MinBinTime": int,
            "_DebugMode": bool,
            "_Rule": {
                "RuleId": str, "MinTimeDelta": int, "MaxTimeDelta": int,
                "ArtefactMatchParameters": [str],
                "HistoryAEvents": "EMPTY_ARRAY",
                "HistoryBEvents": "EMPTY_ARRAY",
                "LastTimestampSeen": float,
                "correlation_history": {"MaxItems": int, "History": [str]},
            },
            "_CheckResult": [str],
            "_NewestTimestamp": float,
        },
        "_TotalRecords": int,
        "_TypeInfo": "ALLOW_ALL",
        "_RuleInfo": {"Rule": str, "Expected": str, "Observed": str},
        "_LogData": {
            "RawLogData": [str],
            "Timestamps": [float],
            "DetectionTimestamp": float,
            "LogLinesCount": int,
            "_AnnotatedMatchElement": str,
        },
        "_StatusInfo": {"ALLOW_ALL_KEYS": {
            "CurrentProcessedLines": int,
            "TotalProcessedLines": int,
        }},
        "_FromTime": float,
        "_ToTime": float,
        "_DebugLog": [str],
    }, optional_key_prefix="_")


# ---------------------------------------------------------------------------
# EximGenericParsingModel (reference:
# source/root/etc/aminer/conf-available/generic/EximGenericParsingModel.py
# :17-733) — one whole-line spec per FirstMatch alternative, nested
# FirstMatches and optional SUB-SEQUENCES expanded into ordered
# variants (reference probe order preserved: with-optional before
# without). All literal "\n" in the reference are BACKSLASH+n byte
# pairs (multiline messages collapsed), kept verbatim. Date/time
# leaves are value-strict pattern fragments (month/day/hour ranges);
# calendar-impossible dates (Feb 30) are the one documented superset,
# same policy as ApacheAccessModel.
# ---------------------------------------------------------------------------

_EX_ALPHA = ("!'#$%&\"()*+,-./0123456789:;<>?@"
             "ABCDEFGHIJKLMNOPQRSTUVWXYZ\\^_`abcdefghijklmnopqrstuvwxyz"
             "{|}~=[]")
_EX_DT_PAT = (r"\d{4}-(?:0[1-9]|1[0-2])-(?:0[1-9]|[12]\d|3[01]) "
              r"(?:[01]\d|2[0-3]):[0-5]\d:[0-5]\d")
_EX_IP_PAT = (r"(?:(?:25[0-5]|2[0-4]\d|[01]?\d?\d)\.){3}"
              r"(?:25[0-5]|2[0-4]\d|[01]?\d?\d)")


def _exim(body: list[tuple]) -> list[tuple]:
    # date_seq head: DateTimeModelElement("%Y-%m-%d %H:%M:%S") + " "
    return [("time", "pattern", _EX_DT_PAT), ("sp", "fixed", " ")] + body


def _exim_deferred_head(n: int = 0) -> list[tuple]:
    return [
        ("id", "delimited", " "),
        ("e0", "fixed", " SMTP error from remote mail server after MAIL FROM:<"),
        ("from_mail", "delimited", ">"),
        ("s0", "fixed", "> SIZE="),
        ("size", "int"),
        ("s1", "fixed", ": host "),
        ("host", "delimited", " "),
        ("s2", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s3", "fixed", "]: 421 "),
        ("version", "delimited", " "),
        ("s4", "fixed", " ["),
        ("domain", "delimited", "]"),
    ]


def _exim_usv_head() -> list[tuple]:
    return [
        ("s0", "fixed", "H="),
        ("h", "delimited", " "),
        ("s1", "fixed", " ("),
        ("domain", "delimited", ")"),
        ("s2", "fixed", ") ["),
        ("ipv6", "ipv6"),
        ("s3", "fixed", "]:"),
        ("port", "int"),
    ]


def _exim_verr_head() -> list[tuple]:
    return [
        ("id", "delimited", " "),
        ("s0", "fixed", " ** "),
        ("mail_to", "delimited", " "),
        ("s1", "fixed", " R="),
        ("r", "delimited", " "),
        ("s2", "fixed", " T="),
        ("t", "delimited", ":"),
    ]


def _exim_spam4_head() -> list[tuple]:
    return [("id", "delimited", " "), ("m0", "fixed", " Completed")]


def _exim_allowed1_head() -> list[tuple]:
    return [
        ("id", "delimited", " "),
        ("s0", "fixed", " H="),
        ("h", "delimited", "["),
        ("s1", "fixed", "["),
        ("host_ip", "ipv4"),
        ("s2", "fixed", "]:"),
        ("port", "int"),
    ]


def _exim_bad_helo(with_upper: bool) -> list[tuple]:
    tail: list[tuple] = [("to", "fixed", ".."), ("upper_ip", "int")] if with_upper else []
    return [
        ("cipher_suite", "delimited", " "),
        ("m0", "fixed",
         " SMTP error from remote mail server after MAIL FROM:<"),
        ("mail_from", "delimited", ">"),
        ("s0", "fixed", "> SIZE="),
        ("size", "int"),
        ("s1", "fixed", ": host "),
        ("host", "delimited", " "),
        ("s2", "fixed", " ["),
        ("host_ip", "ipv4"),
        *tail,
        ("s3", "fixed",
         "]: 550 \"REJECTED - Bad HELO - Host impersonating ["),
        ("original_host", "delimited", "]"),
        ("s4", "fixed", "]\""),
    ]


def _exim_spam_content_blob() -> str:
    # rejected_due_to_spam_content: nested
    # RepeatedElementDataModelElement(FirstMatch([...])) runs — the
    # reference itself marks the variable arg/host counts as
    # "problematic". Each Repeated(fm[SEQ, token+" "]) is the RE2
    # run (?:SEQ|\S+ )+ with the distinctive SEQ preferred, captured
    # as ONE payload blob (documented approximation: RE2 explores
    # combinations the reference's possessive loop would not).
    dt, ip = _EX_DT_PAT, _EX_IP_PAT
    tok, t_colon, t_quote = r"[^ ]+", r"[^:]+", r"[^\"]+"
    seq2 = (
        rf"{dt} {tok} \*\* {tok} R={tok} T={t_colon}: SMTP error from "
        rf"remote mail server after end of data: host {tok} \[{ip}\]: "
        r"554 rejected due to spam content"
    )
    inner = rf"(?:{seq2}|{tok} )+"
    big = (
        rf"{dt} {tok} <= <> R={tok} U={tok} P={tok} S=(?:0|[1-9]\d*) "
        rf'T="{t_quote}" for {tok} {dt} cwd={tok} (?:0|[1-9]\d*) '
        rf"args: {inner}"
    )
    return rf"(?:{big}|{tok} )+"


EXIM_SPECS: dict[str, list[tuple]] = {
    # --- date_seq branch (reference :63-581), in FirstMatch order ---
    "start": _exim([("m0", "fixed", "Start queue run: pid="), ("pid", "int")]),
    "end": _exim([("m0", "fixed", "End queue run: pid="), ("pid", "int")]),
    "no_host_found": _exim([
        ("m0", "fixed", "no host name found for IP address "),
        ("ip", "ipv4"),
    ]),
    "vrfy_failed": _exim([
        ("m0", "fixed", "VRFY failed for "),
        ("mail", "delimited", " "),
        ("s0", "fixed", " H="),
        ("h", "delimited", " "),
        ("s1", "fixed", " ["),
        ("ip", "ipv4"),
        ("s2", "fixed", "]"),
    ]),
    "deferred_temporary": _exim(_exim_deferred_head() + [
        ("s5", "fixed", "] Message from ("),
        ("from_ip", "ipv4"),
        ("s6", "fixed", ") temporarily deferred - "),
        ("reason_code", "delimited", " "),
        ("s7", "fixed", " Please refer to "),
        ("refer_addr", "varbyte", _EX_ALPHA),
    ]),
    "deferred_permanent": _exim(_exim_deferred_head() + [
        ("s5", "fixed", "] All messages from "),
        ("from_ip", "ipv4"),
        ("s6", "fixed", " will be permanently deferred; Retrying will NOT "
                        "succeed. See "),
        ("refer_addr", "varbyte", _EX_ALPHA),
    ]),
    "temporary_deferred_new": _exim([
        ("id", "delimited", " "),
        ("s0", "fixed", " H="),
        ("host", "delimited", " "),
        ("s1", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s2", "fixed", "]: SMTP error from remote mail server after "
                        "pipelined MAIL FROM:<"),
        ("from_mail", "delimited", ">"),
        ("s3", "fixed", "> SIZE="),
        ("size", "int"),
        ("s4", "fixed", ": 421 "),
        ("version", "delimited", " "),
        ("s5", "fixed", " ["),
        ("domain", "delimited", "]"),
        ("s6", "fixed", "] Messages from "),
        ("from_ip", "ipv4"),
        ("s7", "fixed", " temporarily deferred due to unexpected volume or "
                        "user complaints - "),
        ("reason_code", "delimited", " "),
        ("s8", "fixed", " see "),
        ("refer_addr", "varbyte", _EX_ALPHA),
    ]),
    "rate_limited": _exim([
        ("id", "delimited", " "),
        ("m0", "fixed", " SMTP error from remote mail server after end of "
                        "data: host "),
        ("host", "delimited", " "),
        ("s0", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s1", "fixed", "]: 421-"),
        ("version", "delimited", " "),
        ("s2", "fixed", " ["),
        ("ip", "ipv4"),
        ("s3", "fixed", " "),
        ("number", "int"),
        ("m1", "fixed", "] Our system has detected an unusual rate "
                        "of\\n421-"),
        ("version2", "delimited", " "),
        ("m2", "fixed", " unsolicited mail originating from your IP "
                        "address. To protect our\\n421-"),
        ("version3", "delimited", " "),
        ("m3", "fixed", " users from spam, mail sent from your IP address "
                        "has been temporarily\\n421-"),
        ("version4", "delimited", " "),
        ("m4", "fixed", " rate limited. Please visit\\n421-"),
        # consume_delimiter=True → the run plus its space delimiter
        ("version5", "delimited", " "),
        ("c0", "fixed", " "),
        ("website", "delimited", " "),
        ("m5", "fixed", " to review our Bulk\\n421 "),
        ("version6", "delimited", " "),
        ("m6", "fixed", " Email Senders Guidelines. "),
        ("id2", "delimited", " "),
        ("m7", "fixed", " - gsmtp"),
    ]),
    "service_unavailable": _exim([
        ("id", "delimited", " "),
        ("m0", "fixed", " SMTP error from remote mail server after RCPT "
                        "TO:<"),
        ("mail_to", "delimited", ">"),
        ("s0", "fixed", ">: host "),
        ("host", "delimited", " "),
        ("s1", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s2", "fixed", "]: 450 "),
        ("version", "delimited", " "),
        ("m1", "fixed", " Service unavailable"),
    ]),
    "host_unable_to_send": _exim([
        ("id", "delimited", " "),
        ("s0", "fixed", " == "),
        ("from_mail", "delimited", " "),
        ("s1", "fixed", " R="),
        ("r", "delimited", " "),
        ("s2", "fixed", " T="),
        ("t", "delimited", " "),
        ("m0", "fixed", " defer (-44): SMTP error from remote mail server "
                        "after RCPT TO:<"),
        ("to_mail", "delimited", ">"),
        ("s3", "fixed", ">: host "),
        ("host", "delimited", " "),
        ("s4", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s5", "fixed", "]: 451 Temporary local problem - please try later"),
    ]),
    "usv_permission_denied": _exim(_exim_usv_head() + [
        ("m0", "fixed", " sender verify defer for <"),
        ("from_mail", "delimited", ">"),
        ("m1", "fixed", ">: require_files: error for "),
        ("required_file", "delimited", ":"),
        ("m2", "fixed", ": Permission denied"),
    ]),
    "usv_rejected_rcpt": _exim(_exim_usv_head() + [
        ("s4", "fixed", " F=<"),
        ("from", "delimited", ">"),
        ("s5", "fixed", "> A="),
        ("a", "delimited", " "),
        ("m0", "fixed", " temporarily rejected RCPT <"),
        ("rcpt", "delimited", ">"),
        ("m1", "fixed", ">: Could not complete sender verify"),
    ]),
    "domain_size_limit_exceeded": _exim([
        ("id", "delimited", " "),
        ("s0", "fixed", " =="),
        ("mail_to", "delimited", " "),
        ("s1", "fixed", " R="),
        ("r", "delimited", " "),
        ("s2", "fixed", " T="),
        ("t", "delimited", " "),
        ("m0", "fixed", " defer (-44): SMTP error from remote mail server "
                        "after RCPT TO:<"),
        ("mail_to2", "delimited", ">"),
        ("s3", "fixed", ">: host "),
        ("host", "delimited", " "),
        ("s4", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s5", "fixed", "]: 452 <"),
        ("mail_to3", "delimited", ">"),
        ("m1", "fixed", "> Domain size limit exceeded"),
    ]),
    "verification_failed": _exim(_exim_verr_head() + [
        ("m0", "fixed", ": SMTP error from remote mail server after RCPT "
                        "TO:<"),
        ("mail_to2", "delimited", ">"),
        ("s3", "fixed", ">: host "),
        ("host", "delimited", " "),
        ("s4", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s5", "fixed", "]: 550-Verification for <"),
        ("mail_from", "delimited", ">"),
        ("m1", "fixed", ">\\n550-The mail server could not deliver mail "
                        "to "),
        ("mail_to3", "delimited", " "),
        ("m2", "fixed", " The account or domain may not exist, they may be "
                        "blacklisted, or missing the proper dns "
                        "entries.\\n550 Sender verify failed"),
    ]),
    "unable_to_verify": _exim(_exim_verr_head() + [
        ("m0", "fixed", ": SMTP error from remote mail server after MAIL "
                        "FROM:<"),
        ("mail_from", "delimited", ">"),
        ("s3", "fixed", "> SIZE="),
        ("size", "int"),
        ("s4", "fixed", ": host "),
        ("host", "delimited", " "),
        ("s5", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s6", "fixed", "]: 553 <"),
        ("mail_to2", "delimited", ">"),
        ("m1", "fixed", "> unable to verify address\\nVerify that SMPT "
                        "authentication has been enabled."),
    ]),
    "mail_delivery_failure": _exim([
        ("id", "delimited", " "),
        ("s0", "fixed", " <= <> R="),
        ("r", "delimited", " "),
        ("s1", "fixed", " U="),
        ("u", "delimited", " "),
        ("s2", "fixed", " P="),
        ("p", "delimited", " "),
        ("s3", "fixed", " S="),
        ("s", "int"),
        ("s4", "fixed", " T=\"Mail delivery failed: returning message to "
                        "sender\" for "),
        ("mail_from", "varbyte", _EX_ALPHA),
    ]),
    "spam_marka22": _exim([
        ("id", "delimited", " "),
        ("s0", "fixed", " H="),
        ("h", "delimited", " "),
        ("s1", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s2", "fixed", "]:"),
        ("port", "int"),
        ("m0", "fixed", " Warning: \"SpamAssassin as marka22 detected "
                        "message as spam ("),
        ("version", "delimited", ")"),
        ("s3", "fixed", ")\""),
    ]),
    "spam_in": _exim([
        ("id", "delimited", " "),
        ("s0", "fixed", " <="),
        ("host_ip", "ipv4"),
        ("s1", "fixed", " H="),
        ("h", "delimited", "["),
        ("s2", "fixed", "["),
        ("host_ip2", "ipv4"),
        ("s3", "fixed", "]:"),
        ("port", "int"),
        ("s4", "fixed", " P="),
        ("p", "delimited", " "),
        ("s5", "fixed", " S="),
        ("s", "int"),
        ("s6", "fixed", " id="),
        ("id2", "delimited", " "),
        ("s7", "fixed", " T="),
        ("msg", "any"),
    ]),
    "spam_out": _exim([
        ("id", "delimited", " "),
        ("s0", "fixed", " => "),
        ("user", "delimited", " "),
        # DelimitedDataModelElement("s1", "<", consume_delimiter=True)
        ("s1", "delimited", "<"),
        ("c0", "fixed", "<"),
        ("mail_from", "delimited", " "),
        ("s2", "fixed", " [> R="),
        ("r", "delimited", " "),
        ("s3", "fixed", " T="),
        ("t", "any"),
    ]),
    "completed_spam_warning": _exim(_exim_spam4_head() + [
        ("s0", "fixed", " "),
        ("time2", "pattern", _EX_DT_PAT),
        ("s1", "fixed", " "),
        ("id2", "delimited", " "),
        ("s2", "fixed", " H="),
        ("h", "delimited", " "),
        ("s3", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s4", "fixed", "]:"),
        ("port", "int"),
        ("m1", "fixed", " Warning: \"SpamAssassin as marka22 detected "
                        "message as spam ("),
        ("version", "delimited", ")"),
        ("s5", "fixed", ")\""),
    ]),
    "completed": _exim(_exim_spam4_head()),
    "spam_full_trace": _exim([
        ("id", "delimited", " "),
        ("s0", "fixed", " <= "),
        ("mail_from", "delimited", " "),
        ("s1", "fixed", " H="),
        ("h", "delimited", " "),
        ("s2", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s3", "fixed", "]:"),
        ("port", "int"),
        ("s4", "fixed", " P="),
        ("p", "delimited", " "),
        ("s5", "fixed", " S="),
        ("s", "int"),
        ("s6", "fixed", " id="),
        ("id2", "delimited", " "),
        ("s7", "fixed", " T=\""),
        ("t", "delimited", "\""),
        ("s8", "fixed", "\" for "),
        ("mail_for", "delimited", " "),
        ("s9", "fixed", " "),
        ("time2", "pattern", _EX_DT_PAT),
        ("s10", "fixed", " "),
        ("id3", "delimited", " "),
        ("s11", "fixed", " => "),
        ("user", "delimited", " "),
        ("s12", "fixed", " <"),
        ("mail_to", "delimited", " "),
        ("s13", "fixed", " [> R="),
        ("r", "delimited", " "),
        ("s14", "fixed", " T="),
        ("t2", "any"),
    ]),
    "allowed_scanned": _exim(_exim_allowed1_head() + [
        ("m0", "fixed", " Warning: Message has been scanned: no virus or "
                        "other harmful content was found"),
    ]),
    "allowed_not_spam": _exim(_exim_allowed1_head() + [
        ("m0", "fixed", " Warning: \"SpamAssassin as cpaneleximscanner "
                        "detected OUTGOING smtp message as NOT spam ("),
        # DecimalFloat SIGN_TYPE_OPTIONAL, no pad, no exponent
        ("spam_value", "pattern", r"[+-]?(?:0|[1-9]\d*)(?:\.\d+)?"),
        ("s3", "fixed", ")\""),
    ]),
    "allowed_plates": _exim([
        ("id", "delimited", " "),
        ("s0", "fixed", " <= "),
        ("mail_from", "delimited", " "),
        ("s1", "fixed", " H="),
        ("h", "delimited", " "),
        ("s2", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s3", "fixed", "]:"),
        ("port", "int"),
        ("s4", "fixed", " P="),
        ("p", "delimited", " "),
        ("s5", "fixed", " X="),
        ("x", "delimited", " "),
        ("s6", "fixed", " A="),
        ("a", "delimited", " "),
        ("s7", "fixed", " S="),
        ("s", "int"),
        ("s8", "fixed", " T="),
        ("t", "delimited", " "),
        ("m0", "fixed", " plates\" for "),
        ("mail_to", "any"),
    ]),
    "allowed_outbound": _exim([
        ("id", "delimited", " "),
        ("m0", "fixed", " SMTP connection outbound "),
        ("timestamp", "int"),
        ("s0", "fixed", " "),
        ("id2", "delimited", " "),
        ("s1", "fixed", " "),
        ("domain", "delimited", " "),
        ("s2", "fixed", " "),
        ("mail_to", "any"),
    ]),
    "allowed_completed_out": _exim([
        ("id", "delimited", " "),
        ("s0", "fixed", " => "),
        ("mail_from", "delimited", " "),
        ("s1", "fixed", " R="),
        ("r", "delimited", " "),
        ("s2", "fixed", " T="),
        ("t", "delimited", " "),
        ("s3", "fixed", " H="),
        ("h", "delimited", " "),
        ("s4", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s5", "fixed", "] X="),
        ("x", "delimited", " "),
        ("s6", "fixed", " C=\""),
        ("c", "delimited", "\""),
        ("s7", "fixed", "\" "),
        ("time2", "pattern", _EX_DT_PAT),
        ("s8", "fixed", " "),
        ("id2", "delimited", " "),
        ("s9", "fixed", " Completed"),
    ]),
    "spam_sfgthib": _exim([
        ("id", "delimited", " "),
        ("s0", "fixed", " H="),
        ("h", "delimited", " "),
        ("s1", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s2", "fixed", "]:"),
        ("port", "int"),
        ("m0", "fixed", " Warning: \"SpamAssassin as sfgthib detected "
                        "message as spam ("),
        ("version", "delimited", ")"),
        ("s3", "fixed", ")\" "),
        ("time2", "pattern", _EX_DT_PAT),
        ("s4", "fixed", " "),
        ("id2", "delimited", " "),
        ("s5", "fixed", " H="),
        ("h2", "delimited", " "),
        ("s6", "fixed", " ["),
        ("host_ip2", "ipv4"),
        ("s7", "fixed", "]:"),
        ("port2", "int"),
        ("m1", "fixed", " Warning: Message has been scanned: no virus or "
                        "other harmful content was found"),
    ]),
    "spam_in_for": _exim([
        ("id", "delimited", " "),
        ("s0", "fixed", " <= "),
        ("mail_from", "delimited", " "),
        ("s1", "fixed", " H="),
        ("h", "delimited", " "),
        ("s2", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s3", "fixed", "]:"),
        ("port", "int"),
        ("s4", "fixed", " P="),
        ("p", "delimited", " "),
        ("s5", "fixed", " X="),
        ("x", "delimited", " "),
        ("s6", "fixed", " S="),
        ("s", "int"),
        ("s7", "fixed", " id="),
        ("id2", "delimited", " "),
        ("s8", "fixed", " T="),
        ("t", "delimited", " "),
        ("s9", "fixed", " for "),
        ("mail_to", "any"),
    ]),
    # --- generic mail branch (reference :510-580) ---
    "mail_in_bounce_r": _exim([
        ("id", "delimited", " "),
        ("in0", "fixed", " <= <> R="),
        ("r", "delimited", " "),
        ("s0", "fixed", " U="),
        ("u", "delimited", " "),
        ("s1", "fixed", " P="),
        ("p", "delimited", " "),
        # reference quirk kept: the second prefix is P=, not S=
        ("s2", "fixed", " P="),
        ("s", "int"),
    ]),
    "mail_in_bounce_h": _exim([
        ("id", "delimited", " "),
        ("in0", "fixed", " <= <> H="),
        ("h", "delimited", " "),
        ("s0", "fixed", " ["),
        ("ip", "ipv4"),
        ("s1", "fixed", "]"),
        ("s2", "fixed", " P="),
        ("p", "delimited", " "),
        ("s3", "fixed", " P="),
        ("s", "int"),
    ]),
    "mail_in_id": _exim([
        ("id", "delimited", " "),
        ("in0", "fixed", " <= "),
        ("mail", "delimited", " "),
        ("s0", "fixed", " U="),
        ("user", "delimited", " "),
        ("s1", "fixed", " P="),
        ("p", "delimited", " "),
        ("s2", "fixed", " S="),
        ("s", "int"),
        ("s3", "fixed", " id="),
        ("id2", "any"),
    ]),
    "mail_in": _exim([
        ("id", "delimited", " "),
        ("in0", "fixed", " <= "),
        ("mail", "delimited", " "),
        ("s0", "fixed", " U="),
        ("user", "delimited", " "),
        ("s1", "fixed", " P="),
        ("p", "delimited", " "),
        ("s2", "fixed", " S="),
        ("s", "int"),
    ]),
    "mail_out_brack": _exim([
        ("id", "delimited", " "),
        ("out0", "fixed", " => "),
        ("name", "delimited", " "),
        ("sp1", "fixed", " ("),
        ("brack_mail", "delimited", ")"),
        ("b2", "fixed", ") <"),
        ("mail", "delimited", ">"),
        ("r0", "fixed", "> R="),
        ("r", "delimited", " "),
        ("t0", "fixed", " T="),
        ("t", "varbyte", _EX_ALPHA),
    ]),
    "mail_out": _exim([
        ("id", "delimited", " "),
        ("out0", "fixed", " => "),
        ("name", "delimited", " "),
        ("sp1", "fixed", " <"),
        ("mail", "delimited", ">"),
        ("r0", "fixed", "> R="),
        ("r", "delimited", " "),
        ("t0", "fixed", " T="),
        ("t", "varbyte", _EX_ALPHA),
    ]),
    "mail_aster": _exim([
        ("id", "delimited", " "),
        ("a0", "fixed", " ** "),
        ("command", "delimited", " "),
        ("m0", "fixed", " Too many \"Received\" headers - suspected mail "
                        "loop"),
    ]),
    "mail_completed": _exim([
        ("id", "delimited", " "), ("m0", "fixed", " Completed")]),
    "mail_frozen": _exim([
        ("id", "delimited", " "), ("m0", "fixed", " Message is frozen")]),
    "mail_frozen2": _exim([
        ("id", "delimited", " "),
        ("m0", "fixed", " Frozen (delivery error message)")]),
    # --- non-date heads (reference :583-730) ---
    "no_date_retry_timeout": [
        ("s0", "fixed", "TO:<"),
        ("to_mail", "delimited", ">"),
        ("s1", "fixed", ">: host "),
        ("host", "delimited", " "),
        ("s2", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s3", "fixed", "]: 450 "),
        ("version", "delimited", " "),
        ("m0", "fixed", " Client host rejected: cannot find your "
                        "hostname, ["),
        ("host_ip2", "ipv4"),
        ("s4", "fixed", "] "),
        ("time", "pattern", _EX_DT_PAT),
        ("s5", "fixed", " "),
        ("id", "delimited", " "),
        ("s6", "fixed", " ** "),
        ("to_mail2", "delimited", ">"),
        ("m1", "fixed", ">: retry timeout exceeded"),
    ],
    "invalid_dns_record": [
        ("m0", "fixed", "SMTP error from remote mail server after RCPT "
                        "TO:: host "),
        ("host", "delimited", "["),
        ("s0", "fixed", "["),
        ("host_ip", "ipv4"),
        ("s1", "fixed", "]: 550-Sender has no A, AAAA, or MX DNS "
                        "records. "),
        ("host2", "delimited", "\\"),
        ("s2", "fixed", "\\n550 l "),
        ("host3", "delimited", "\\"),
        ("m1", "fixed", "\\nVerify the zone file in "),
        ("file", "delimited", " "),
        ("m2", "fixed", " for the correct information. If it appear "
                        "correct, you can run named-checkzone domain.com "
                        "domain.com.db to verify if named is able to load "
                        "the zone."),
    ],
    "mail_rejected": [
        ("m0", "fixed", "Diagnostic-Code: X-Postfix; host "),
        ("host", "delimited", " "),
        ("s0", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s1", "fixed", "] said: 550 "),
        ("version", "delimited", " "),
        ("m1", "fixed", " Message rejected due to content restrictions (in "
                        "reply to end of DATA command)\\nWhen you see an "
                        "error such as 550 "),
        ("version2", "varbyte", _EX_ALPHA),
    ],
    "mail_authentication_error": [
        ("m0", "fixed", "Final-Recipient: rfc822;"),
        ("mail_from", "delimited", "\\"),
        ("m1", "fixed", "\\nAction: failed\\nStatus: "),
        ("status", "delimited", "\\"),
        ("m2", "fixed", "\\nDiagnostic-Code: smtp;550-Please turn on SMTP "
                        "Authentication in your mail client.\\n550-"),
        ("host", "delimited", " "),
        ("s0", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s1", "fixed", "]:"),
        ("port", "int"),
        ("m3", "fixed", " is not permitted to relay 550 through this "
                        "server without authentication."),
    ],
    "bad_helo_upper": _exim_bad_helo(True),
    "bad_helo": _exim_bad_helo(False),
    "domain_not_exists": [
        ("m0", "fixed", "SMTP error from remote mail server after MAIL "
                        "FROM:<"),
        ("mail_from", "delimited", ">"),
        ("s0", "fixed", ">: host "),
        ("host", "delimited", " "),
        ("s1", "fixed", " ["),
        ("host_ip", "ipv4"),
        ("s2", "fixed", "]: 553 sorry, your domain does not exists."),
    ],
    "rejected_due_to_spam_content": [
        ("time", "pattern", r"\[(?:[01]\d|2[0-3]):[0-5]\d:[0-5]\d"),
        ("h0", "fixed", " hosts"),
        ("hosts_number", "int"),
        ("s0", "fixed", " "),
        ("payload", "pattern", _exim_spam_content_blob()),
    ],
}


# ---------------------------------------------------------------------------
# AudispdParsingModel (reference:
# source/root/etc/aminer/conf-available/generic/AudispdParsingModel.py
# :22-946) — the reference branches on the audit record TYPE via
# ElementValueBranchModelElement (WhiteSpaceLimited "type" token →
# branch dict, default_branch=None); since the type tokens are
# disjoint literals, enumerating one whole-line spec per type with
# the token + following " msg=audit(" folded into one fixed literal
# is exactly equivalent (unknown types reject in both engines).
# ExecArgumentDataModelElement (reference :25-66) is the custom
# quoted / "(null)" / upper-hex-pair-run leaf; the empty hex run is a
# VALID zero-length match there, mirrored by the trailing "*".
# ---------------------------------------------------------------------------

_AU_ALPHA = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
             "abcdefghijklmnopqrstuvwxyz0123456789._-")
_AU_PERMS = "abcdefghijklmnopqrstuvwxyz,"
# ExecArgument: quoted (first closing quote) | "(null)" | even-length
# UPPER-case hex run (possibly empty)
_AU_EXECARG = r'(?:"[^"]*"|\(null\)|(?:[0-9A-F]{2})*)'
# WhiteSpaceLimitedDataModelElement: >=1 byte, stops at space/tab only
_AU_WS = r"[^ \t]+"
# DecimalInteger SIGN_TYPE_OPTIONAL (PAD_NONE): "-" admits leading
# zeros (the no-leading-zero guard only fires on a bare "0<digit>"
# start, DecimalIntegerValueModelElement.py:71-74)
_AU_SINT = r"(?:-\d+|0|[1-9]\d*)"
_AU_INT = r"(?:0|[1-9]\d*)"
_AU_STATUS = ("status", "wordlist", ["failed", "success"])
# NETFILTER_PKT saddr/daddr: FirstMatch[ipv4, ipv6] (reference
# :530-538) — ipv4 probes first; fragments mirror the engine's
# value-strict ipv4 and RFC4291 ipv6 kinds
_AU_IPANY = "(?:" + _IP4_PAT + "|" + '(?:(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}|(?:[0-9A-Fa-f]{1,4}:){1,7}:|:(?::[0-9A-Fa-f]{1,4}){1,7}|(?:[0-9A-Fa-f]{1,4}:){1,6}(?::[0-9A-Fa-f]{1,4}){1,6}|::)' + ")"


def _audispd(t: str, body: list[tuple]) -> list[tuple]:
    # optional "audispd: " / "audisp-remote: " syslog tag + preamble
    # "type=<T> msg=audit(<sec>.<ms>:<seq>):"; ms is PAD_TYPE_ZERO
    # (leading zeros OK) -> \d+
    return [
        ("pre", "pattern", r"(?:audispd: |audisp-remote: )?"),
        ("t0", "fixed", f"type={t} msg=audit("),
        ("time", "int"),
        ("d0", "fixed", "."),
        ("ms", "pattern", r"\d+"),
        ("c0", "fixed", ":"),
        ("seq", "int"),
        ("p0", "fixed", "):"),
    ] + body


def _au_pam_tail(hostname_lit: str, close_lit: str) -> list[tuple]:
    # shared "...exe=..." hostname/addr/terminal/res tail of the PAM
    # branches; hostname_lit distinguishes '" hostname=' from
    # '" (hostname=' and close_lit "'" from ")'"
    return [
        ("exec", "delimited", '"'),
        ("h0", "fixed", hostname_lit),
        ("clientname", "delimited", " "),
        ("a0", "fixed", " addr="),
        ("clientip", "delimited", " "),
        ("te0", "fixed", " terminal="),
        ("terminal", "pattern", _AU_WS),
        ("r0", "fixed", " res="),
        _AU_STATUS,
        ("cl0", "fixed", close_lit),
    ]


def _au_ints(*names: str) -> list[tuple]:
    out: list[tuple] = []
    for n in names:
        out.append((f"f_{n}", "fixed", f" {n}="))
        out.append((n, "int"))
    return out


AUDISPD_SPECS: dict[str, list[tuple]] = {
    "addgroup": _audispd("ADD_GROUP", _au_ints("pid", "uid", "auid", "ses") + [
        ("s4", "fixed", " subj="),
        ("subj", "delimited", " "),
        ("s5", "fixed", " msg='op=adding group acct=\""),
        ("acct", "delimited", '"'),
        ("s6", "fixed", '" exe="'),
    ] + _au_pam_tail('" hostname=', "'")),
    "adduser": _audispd("ADD_USER", _au_ints("pid", "uid", "auid", "ses") + [
        ("s4", "fixed", " subj="),
        ("subj", "delimited", " "),
        ("s5", "wordlist", [" msg='op=adding user id=",
                            " msg='op=adding home directory id="]),
        ("newuserid", "int"),
        ("s6", "fixed", ' exe="'),
    ] + _au_pam_tail('" hostname=', "'")),
    "anom_abend": _audispd("ANOM_ABEND", _au_ints("auid", "uid", "gid", "ses") + [
        ("s4", "fixed", " subj="),
        ("subj", "delimited", " "),
        ("s5", "fixed", " pid="),
        ("pid", "int"),
        ("s6", "fixed", " comm="),
        ("command", "pattern", _AU_EXECARG),
        ("s7", "fixed", " reason="),
        ("reason", "pattern", _AU_EXECARG),
        ("s8", "fixed", " sig="),
        ("sig", "int"),
    ]),
    "anom_exec": _audispd("ANOM_EXEC", [
        ("s", "fixed", " "),
        ("user", "varbyte", _AU_ALPHA),
    ] + _au_ints("pid", "uid", "auid", "ses") + [
        ("s4", "fixed", " msg='op="),
        ("msg", "delimited", " "),
        ("s5", "fixed", ' acct="'),
        ("acct", "delimited", '"'),
        ("s6", "fixed", '" exe="'),
        ("exec", "delimited", '"'),
        ("s7", "fixed", '" (hostname='),
        ("hostname", "delimited", ","),
        ("s8", "fixed", ", addr="),
        ("addr", "delimited", ","),
        ("s9", "fixed", ", terminal="),
        ("terminal", "delimited", " "),
        ("s10", "fixed", " res="),
        _AU_STATUS,
        ("s11", "fixed", ")'"),
    ]),
    "anom_promiscuous": _audispd("ANOM_PROMISCUOUS", [
        ("s0", "fixed", " dev="),
        ("dev", "varbyte", _AU_ALPHA),
    ] + _au_ints("prom", "old_prom", "auid", "uid", "gid", "ses")),
    "bprmfcaps": _audispd("BPRM_FCAPS", [
        ("s0", "fixed", " fver="),
        ("fver", "int"),
        ("s1", "fixed", " fp="),
        ("fp", "pattern", r"[0-9a-f]+"),
        ("s2", "fixed", " fi="),
        ("fi", "pattern", r"[0-9a-f]+"),
        ("s3", "fixed", " fe="),
        ("fe", "pattern", r"[0-9a-f]+"),
        ("s4", "fixed", " old_pp="),
        ("pp_old", "delimited", " "),
        ("s5", "fixed", " old_pi="),
        ("pi_old", "delimited", " "),
        ("s6", "fixed", " old_pe="),
        ("pe_old", "delimited", " "),
        ("s7", "fixed", " new_pp="),
        ("pp_new", "delimited", " "),
        ("s8", "fixed", " new_pi="),
        ("pi_new", "delimited", " "),
        ("s9", "fixed", " new_pe="),
        ("pe_new", "any"),
    ]),
    "conf_change": _audispd("CONFIG_CHANGE", _au_ints("auid", "ses") + [
        ("s2", "fixed", ' op="'),
        ("op", "delimited", '"'),
        ("s3", "fixed", '" path="'),
        ("path", "delimited", '"'),
        ("s4", "fixed", '" key='),
        ("key", "delimited", " "),
        ("s5", "fixed", " list="),
        ("list", "int"),
        ("s6", "fixed", " res="),
        ("result", "int"),
    ]),
    "credacq": _audispd("CRED_ACQ", _au_ints("pid", "uid", "auid", "ses") + [
        ("s4", "fixed", " msg='op=PAM:setcred acct=\""),
        ("username", "delimited", '"'),
        ("s5", "fixed", '" exe="'),
    ] + _au_pam_tail('" hostname=', "'")),
    "creddisp": _audispd("CRED_DISP", _au_ints("pid", "uid", "auid", "ses") + [
        ("s4", "fixed", " msg='op=PAM:setcred acct=\""),
        ("username", "delimited", '"'),
        ("s5", "fixed", '" exe="'),
    ] + _au_pam_tail('" hostname=', "'")),
    "credrefr": _audispd("CRED_REFR", _au_ints("pid", "uid", "auid", "ses") + [
        ("s4", "fixed", " msg='op=PAM:setcred acct=\"root\""
                        ' exe="/usr/sbin/sshd" hostname='),
        ("clientname", "ipv4"),
        ("s5", "fixed", " addr="),
        ("clientip", "ipv4"),
        ("s6", "fixed", " terminal="),
        ("terminal", "delimited", " "),
        ("s7", "fixed", " res="),
        _AU_STATUS,
        ("s8", "fixed", "'"),
    ]),
    "crypto_session": _audispd("CRYPTO_SESSION", [
        ("s", "fixed", " "),
        ("user", "varbyte", _AU_ALPHA),
    ] + _au_ints("pid", "uid", "auid") + [
        ("s4", "fixed", " msg='op="),
        ("msg", "delimited", " "),
        ("s5", "fixed", " direction="),
        ("direction", "delimited", " "),
        ("s6", "fixed", " cipher="),
        ("cipher", "delimited", " "),
        ("s7", "fixed", " ksize="),
        ("ksize", "int"),
        ("s8", "fixed", " rport="),
        ("rport", "int"),
        ("s9", "fixed", " laddr="),
        ("laddr", "ipv4"),
        ("s10", "fixed", " lport="),
        ("lport", "int"),
        ("s11", "fixed", " id="),
        ("id", "int"),
        ("s12", "fixed", ' exe="'),
        ("exec", "delimited", '"'),
        ("s13", "fixed", '" (hostname='),
        ("hostname", "delimited", ","),
        ("s14", "fixed", ", addr="),
        ("addr", "delimited", ","),
        ("s15", "fixed", ", terminal="),
        ("terminal", "delimited", " "),
        ("s16", "fixed", " res="),
        _AU_STATUS,
        ("s17", "fixed", ")'"),
    ]),
    "cwd": _audispd("CWD", [
        ("s0", "fixed", "  cwd="),
        ("cwd", "pattern", _AU_EXECARG),
    ]),
    "daemon_abort": _audispd("DAEMON_ABORT", [
        ("s0", "fixed", " auditd error halt,"),
    ] + _au_ints("auid", "pid") + [
        ("s3", "fixed", " res="),
        _AU_STATUS,
    ]),
    "daemon_config": _audispd("DAEMON_CONFIG", [
        ("s0", "fixed", " auditd error getting hup info - no change,"
                        " sending auid="),
        ("auid", "delimited", " "),
        ("s2", "fixed", " pid="),
        ("pid", "delimited", " "),
        ("s3", "fixed", " subj="),
        ("subj", "delimited", " "),
        ("s4", "fixed", " res="),
        _AU_STATUS,
    ]),
    "daemon_end": _audispd("DAEMON_END", [
        ("s0", "fixed", " auditd normal halt, sending auid="),
        ("auid", "delimited", " "),
        ("s2", "fixed", " pid="),
        ("pid", "delimited", " "),
        ("s3", "fixed", " subj="),
        ("subj", "optional", ("subj", "pattern", r"[^ ]+")),
        ("s4", "fixed", " res="),
        _AU_STATUS,
    ]),
    "daemon_resume": _audispd("DAEMON_RESUME", [
        ("s0", "fixed", " auditd resuming logging, sending auid="),
        ("auid", "delimited", " "),
        ("s2", "fixed", " pid="),
        ("pid", "delimited", " "),
        ("s3", "fixed", " subj="),
        ("subj", "delimited", " "),
        ("s4", "fixed", " res="),
        _AU_STATUS,
    ]),
    "daemon_start": _audispd("DAEMON_START", [
        ("s0", "fixed", " auditd start, ver="),
        ("ver", "float"),
        ("s1", "fixed", " format="),
        ("format", "delimited", " "),
        ("s2", "fixed", " kernel="),
        ("kernel", "delimited", " "),
        ("s3", "fixed", " auid="),
        ("auid", "delimited", " "),
        ("s4", "fixed", " pid="),
        ("pid", "delimited", " "),
        ("s5", "fixed", " res="),
        _AU_STATUS,
    ]),
    "execve": _audispd("EXECVE", [
        ("s0", "fixed", " argc="),
        ("argc", "int"),
        # RepeatedElementDataModelElement(min_repeat=1): >=1 arg
        ("args", "pattern", rf"(?: a{_AU_INT}={_AU_EXECARG})+"),
    ]),
    "fdpair": _audispd("FD_PAIR", _au_ints("fd0", "fd1")),
    "login": _audispd("LOGIN", [
        ("s0", "fixed", " login"),
    ] + _au_ints("pid", "uid") + [
        ("s3", "wordlist", [" old auid=", " old-auid="]),
        ("auid_old", "int"),
        ("s4", "wordlist", [" new auid=", " auid="]),
        ("auid_new", "int"),
        ("s5", "wordlist", [" old ses=", " old-ses="]),
        ("ses_old", "int"),
        ("s6", "wordlist", [" new ses=", " ses="]),
        ("ses_new", "int"),
        ("result", "pattern", rf"(?: res={_AU_INT})?"),
    ]),
    "mac_status": _audispd("MAC_STATUS", _au_ints("enforcing", "old_enforcing") + [
        ("s2", "fixed", " auid="),
        ("auid", "delimited", " "),
        ("s3", "fixed", " ses="),
        ("ses", "int"),
    ]),
    "netfilter_cfg": _audispd("NETFILTER_CFG", [
        ("s0", "fixed", " table="),
        ("table", "wordlist", ["filter", "mangle", "nat"]),
    ] + _au_ints("family", "entries")),
    "netfilter_pkt": _audispd("NETFILTER_PKT", [
        ("s0", "fixed", " mark=0x"),
        ("mark", "pattern", r"[0-9a-f]+"),
        ("s1", "fixed", " saddr="),
        ("saddr", "pattern", _AU_IPANY),
        ("s2", "fixed", " daddr="),
        ("daddr", "pattern", _AU_IPANY),
        ("s3", "fixed", " proto="),
        ("proto", "int"),
    ]),
    "objpid": _audispd("OBJ_PID", [
        ("s0", "fixed", " opid="),
        ("opid", "int"),
        ("s1", "fixed", " oauid="),
        ("oauid", "pattern", _AU_SINT),
        ("s2", "fixed", " ouid="),
        ("ouid", "int"),
        ("s3", "fixed", " oses="),
        ("oses", "pattern", _AU_SINT),
        ("s4", "fixed", " obj="),
        ("obj", "delimited", " "),
        ("s5", "fixed", " ocomm="),
        ("ocomm", "pattern", _AU_EXECARG),
    ]),
    # FirstMatch fsinfo: inodeinfo probes before the bare noinfo
    # fallback (reference :561-580)
    "path_inode": _audispd("PATH", [
        ("s0", "fixed", " item="),
        ("item", "int"),
        ("s1", "fixed", " name="),
        ("name", "pattern", _AU_EXECARG),
        ("s2", "fixed", " inode="),
        ("inode", "int"),
        ("s3", "fixed", " dev="),
        ("dev", "varbyte", "0123456789abcdef:"),
        ("s4", "fixed", " mode="),
        ("mode", "pattern", r"\d+"),
        ("s5", "fixed", " ouid="),
        ("ouid", "int"),
        ("s6", "fixed", " ogid="),
        ("ogid", "int"),
        ("s7", "fixed", " rdev="),
        ("rdev", "varbyte", "0123456789abcdef:"),
        ("s8", "fixed", " nametype="),
        ("nametype", "wordlist", ["CREATE", "DELETE", "NORMAL",
                                  "PARENT", "UNKNOWN"]),
    ]),
    "path_noinfo": _audispd("PATH", [
        ("s0", "fixed", " item="),
        ("item", "int"),
        ("s1", "fixed", " name="),
        ("name", "pattern", _AU_EXECARG),
        ("s2", "fixed", " nametype="),
        ("nametype", "wordlist", ["CREATE", "DELETE", "NORMAL",
                                  "PARENT", "UNKNOWN"]),
    ]),
    "proctitle": _audispd("PROCTITLE", [
        ("s0", "fixed", " proctitle="),
        ("proctitle", "pattern", _AU_EXECARG),
    ]),
    "selinux_err": _audispd("SELINUX_ERR", [
        ("s0", "fixed", " op="),
        ("op", "delimited", " "),
        ("s1", "fixed", " reason="),
        ("reason", "delimited", " "),
        ("s2", "fixed", " scontext="),
        ("scontext", "delimited", " "),
        ("s3", "fixed", " tcontext="),
        ("tcontext", "delimited", " "),
        ("s4", "fixed", " tclass="),
        ("tclass", "delimited", " "),
        ("s5", "fixed", " perms="),
        ("perms", "varbyte", _AU_PERMS),
    ]),
    "service_start": _audispd("SERVICE_START", _au_ints("pid", "uid", "auid", "ses") + [
        ("s4", "fixed", " msg='"),
        # OptionalMatch(Delimited(" ")) commits if >=1 non-space byte
        # follows; the next literal begins with a space, so a plain
        # optional group has the same accept set
        ("msg", "optional", ("msg", "pattern", r"[^ ]+")),
        ("s5", "fixed", ' comm="'),
        ("comm", "delimited", '"'),
        ("s6", "fixed", '" exe="'),
    ] + _au_pam_tail('" hostname=', "'")),
    "service_stop": _audispd("SERVICE_STOP", _au_ints("pid", "uid", "auid", "ses") + [
        ("s4", "fixed", " msg='"),
        ("msg", "optional", ("msg", "pattern", r"[^ ]+")),
        ("s5", "fixed", ' comm="'),
        ("comm", "delimited", '"'),
        ("s6", "fixed", '" exe="'),
    ] + _au_pam_tail('" hostname=', "'")),
    "sockaddr": _audispd("SOCKADDR", [
        ("s0", "fixed", " saddr="),
        ("sockaddr", "pattern", r"[0-9A-F]+"),
    ]),
    "socketcall": _audispd("SOCKETCALL", [
        ("s0", "fixed", " nargs="),
        ("nargs", "int"),
        ("args", "pattern", rf"(?: a{_AU_INT}={_AU_INT})+"),
    ]),
    "syscall": _audispd("SYSCALL", [
        ("s0", "fixed", " arch="),
        ("arch", "pattern", r"[0-9a-f]+"),
        ("s1", "fixed", " syscall="),
        ("syscall", "int"),
        ("personality", "pattern", rf"(?: per={_AU_INT})?"),
        ("result", "pattern",
         rf"(?: success=(?:no|yes) exit={_AU_SINT})?"),
        ("s4", "fixed", " a0="),
        ("arg0", "pattern", r"[0-9a-f]+"),
        ("s5", "fixed", " a1="),
        ("arg1", "pattern", r"[0-9a-f]+"),
        ("s6", "fixed", " a2="),
        ("arg2", "pattern", r"[0-9a-f]+"),
        ("s7", "fixed", " a3="),
        ("arg3", "pattern", r"[0-9a-f]+"),
    ] + _au_ints("items", "ppid", "pid", "auid", "uid", "gid", "euid",
                 "suid", "fsuid", "egid", "sgid", "fsgid") + [
        ("s20", "fixed", " tty="),
        ("tty", "delimited", " "),
        ("s21", "fixed", " ses="),
        ("sesid", "int"),
        ("s22", "fixed", " comm="),
        ("command", "pattern", _AU_EXECARG),
        ("s23", "fixed", ' exe="'),
        ("executable", "delimited", '"'),
        ("s24", "fixed", '" key='),
        ("key", "any"),
    ]),
    "unknown_proctitle": _audispd("UNKNOWN[1327]", [
        ("s0", "fixed", " proctitle="),
        ("proctitle", "pattern", _AU_EXECARG),
    ]),
    "useracct": _audispd("USER_ACCT", [
        ("s", "fixed", " "),
        ("user", "delimited", " "),
    ] + _au_ints("pid", "uid", "auid", "ses") + [
        ("s4", "fixed", " msg='op=PAM:accounting acct=\""),
        ("username", "delimited", '"'),
        ("s5", "fixed", '" exe="'),
    ] + _au_pam_tail('" (hostname=', ")'")),
    "userauth": _audispd("USER_AUTH", _au_ints("pid", "uid", "auid", "ses") + [
        ("s4", "fixed", " msg='op=PAM:authentication acct=\""),
        ("username", "delimited", '"'),
        ("s5", "fixed", '" exe="'),
    ] + _au_pam_tail('" hostname=', "'")),
    "user_cmd": _audispd("USER_CMD", [
        ("s", "fixed", " "),
        ("user", "delimited", " "),
    ] + _au_ints("pid", "uid", "auid") + [
        ("s3", "fixed", " msg='"),
        ("msg", "delimited", " "),
        ("s4", "fixed", ' cmd="'),
        ("cmd", "delimited", '"'),
        ("s5", "fixed", '" (terminal=pts/0 res='),
        _AU_STATUS,
        ("s7", "fixed", ")'"),
    ]),
    "userend": _audispd("USER_END", [
        ("s", "fixed", " "),
        ("user", "delimited", " "),
    ] + _au_ints("pid", "uid", "auid") + [
        ("s4", "fixed", " msg='PAM: session close acct=\""),
        ("username", "delimited", '"'),
        ("s5", "fixed", '" : exe="'),
    ] + _au_pam_tail('" (hostname=', ")'")),
    "usererr": _audispd("USER_ERR", [
        ("s", "fixed", " "),
        ("user", "delimited", " "),
    ] + _au_ints("pid", "uid", "auid") + [
        ("s3", "fixed", " msg='PAM: bad_ident acct=? : exe=\""),
    ] + _au_pam_tail('" (hostname=', ")'")),
    "userlogin": _audispd("USER_LOGIN", [
        ("s", "fixed", " "),
        ("user", "delimited", " "),
    ] + _au_ints("pid", "uid", "auid") + [
        ("s3", "fixed", " msg='acct=\""),
        ("acct", "delimited", '"'),
        ("s4", "fixed", '": exe="'),
    ] + _au_pam_tail('" (hostname=', ")'")),
    "user_role_change": _audispd("USER_ROLE_CHANGE", [
        ("s", "fixed", " "),
        ("user", "delimited", " "),
    ] + _au_ints("pid", "uid", "auid") + [
        ("s3", "fixed", " subj="),
        ("subj", "delimited", " "),
        ("s4", "fixed", " msg='pam: "),
        ("msg", "delimited", " "),
        ("s5", "fixed", " selected-context="),
        ("selected_context", "delimited", " "),
        ("s6", "fixed", ' exe="'),
    ] + _au_pam_tail('" (hostname=', ")'")),
    "userstart": _audispd("USER_START", [
        ("s", "fixed", " "),
        ("user", "delimited", " "),
    ] + _au_ints("pid", "uid", "auid") + [
        ("s3", "fixed", " msg='PAM: session open acct=\""),
        ("username", "delimited", '"'),
        ("s4", "fixed", '" : exe="'),
    ] + _au_pam_tail('" (hostname=', ")'")),
}

# the ~99 catch-all branches: AnyByteDataModelElement (>=1 byte)
_AUDISPD_ANY_TYPES = [
    "ANOM_ACCESS_FS", "ANOM_ADD_ACCT", "ANOM_AMTU_FAIL",
    "ANOM_CRYPTO_FAIL", "ANOM_DEL_ACCT", "ANOM_LOGIN_ACCT",
    "ANOM_LOGIN_FAILURES", "ANOM_LOGIN_LOCATION",
    "ANOM_LOGIN_SESSIONS", "ANOM_LOGIN_TIME", "ANOM_MAX_DAC",
    "ANOM_MAX_MAC", "ANOM_MK_EXEC", "ANOM_MOD_ACCT",
    "ANOM_RBAC_FAIL", "ANOM_RBAC_INTEGRITY_FAIL", "ANOM_ROOT_TRANS",
    "AVC", "AVC_PATH", "CAPSET", "CHGRP_ID", "CHUSER_ID",
    "CRYPTO_FAILURE_USER", "CRYPTO_KEY_USER", "CRYPTO_LOGIN",
    "CRYPTO_LOGOUT", "CRYPTO_PARAM_CHANGE_USER", "CRYPTO_REPLAY_USER",
    "CRYPTO_TEST_USER", "DAC_CHECK", "DAEMON_ACCEPT", "DAEMON_CLOSE",
    "DAEMON_ROTATE", "DEL_GROUP", "DEL_USER", "EOE", "FS_RELABEL",
    "GRP_AUTH", "INTEGRITY_DATA", "INTEGRITY_HASH",
    "INTEGRITY_METADATA", "INTEGRITY_PCR", "INTEGRITY_RULE",
    "INTEGRITY_STATUS", "IPC", "IPC_SET_PERM", "KERNEL",
    "KERNEL_OTHER", "LABEL_LEVEL_CHANGE", "LABEL_OVERRIDE",
    "MAC_CIPSOV4_ADD", "MAC_CIPSOV4_DEL", "MAC_CONFIG_CHANGE",
    "MAC_IPSEC_EVENT", "MAC_MAP_ADD", "MAC_MAP_DEL",
    "MAC_POLICY_LOAD", "MAC_UNLBL_ALLOW", "MAC_UNLBL_STCADD",
    "MAC_UNLBL_STCDEL", "MMAP", "MQ_GETSETATTR", "MQ_NOTIFY",
    "MQ_OPEN", "MQ_SENDRECV", "RESP_ACCT_LOCK",
    "RESP_ACCT_LOCK_TIMED", "RESP_ACCT_REMOTE",
    "RESP_ACCT_UNLOCK_TIMED", "RESP_ALERT", "RESP_ANOMALY",
    "RESP_EXEC", "RESP_HALT", "RESP_KILL_PROC", "RESP_SEBOOL",
    "RESP_SINGLE", "RESP_TERM_ACCESS", "RESP_TERM_LOCK",
    "ROLE_ASSIGN", "ROLE_MODIFY", "ROLE_REMOVE", "SYSTEM_BOOT",
    "SYSTEM_RUNLEVEL", "SYSTEM_SHUTDOWN", "TRUSTED_APP", "TTY",
    "USER_AVC", "USER_CHAUTHTOK", "USER_LABELED_EXPORT",
    "USER_LOGOUT", "USER_MAC_POLICY_LOAD", "USER_MGMT",
    "USER_SELINUX_ERR", "USER_TTY", "USER_UNLABELED_EXPORT",
    "USYS_CONFIG", "VIRT_CONTROL", "VIRT_MACHINE_ID", "VIRT_RESOURCE",
]
for _t in _AUDISPD_ANY_TYPES:
    AUDISPD_SPECS[_t.lower()] = _audispd(_t, [("payload", "any")])

# the non-record alternative of the top FirstMatch (reference :943)
AUDISPD_SPECS["queue_full"] = [
    ("pre", "pattern", r"(?:audispd: |audisp-remote: )?"),
    ("q0", "fixed", "queue is full - dropping event"),
]


# ---------------------------------------------------------------------------
# AIT-LDS SyslogParsingModel (reference conf-available/generic/
# SyslogParsingModel.py:17-1010): '%b %d %H:%M:%S' syslog head + host
# + one FirstMatch over ~60 service branches (dovecot / horde webmail
# / account tools / cron / sshd / su / kernel / systemd units / boot
# probes / dhclient / mail + db daemons). Translation notes beyond
# the shared divergence classes (see module docstring):
# - the DateTimeModelElement head is VALUE-strict per the reference
#   algorithm (DateTimeModelElement.py:214-260): %b = exact locale
#   month-name table; %d/%H/%M/%S are fixed 2-byte windows parsed by
#   Python int() — so space-padded (" 1"), trailing-space ("1 ") and
#   "+d"/-0 forms all parse, and value 0 for the DAY is substituted
#   with the current day (datetime build, :278-286). The fragments
#   below enumerate exactly the int()-accepted 2-byte windows in
#   range; calendar coupling (Feb 29/30 vs the stateful start_year)
#   is the one documented superset, unreachable from the fixture set.
# - multi-leaf OptionalMatch sub-sequences with secondary captures
#   collapse to ONE optional pattern leaf (blob capture), mirroring
#   the audispd translation.
# - the horde branches end in Delimited(" [") catch-alls; a lazy run
#   would ACCEPT a msg containing an early " [" that the reference's
#   first-occurrence cut rejects, and a single fuzz insertion can
#   create one — _NO_SP_LBRACK is the 2-state-DFA fragment for
#   "nonempty run not containing ' ['" (RE2 has no lookahead).
# ---------------------------------------------------------------------------

_AIT_D2 = r"(?:[0-2]\d|3[01]|[ +]\d|\d |-0)"
_AIT_H2 = r"(?:[01]\d|2[0-3]|[ +]\d|\d |-0)"
_AIT_MS2 = r"(?:[0-5]\d|[ +]\d|\d |-0)"
_AIT_DT = (r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) "
           + _AIT_D2 + " " + _AIT_H2 + ":" + _AIT_MS2 + ":" + _AIT_MS2)
_AIT_ALPHA = ("!'#$%&\"()*+,-./0123456789:;<>?@ABCDEFGHIJKLMNOPQRSTUVWXYZ"
              "\\^_`abcdefghijklmnopqrstuvwxyz{|}~=[]")
# nonempty run with no " [" substring (2-state DFA, no lookahead)
_NO_SP_LBRACK = r"(?:(?:[^ ]| +[^ \[])+ *| +)"


def _ait(body: list[tuple]) -> list[tuple]:
    return [
        ("time", "pattern", _AIT_DT),
        ("sp1", "fixed", " "),
        ("host", "delimited", " "),
    ] + body


def _ait_user_info(tag: str = "") -> list[tuple]:
    # shared dovecot user_info sequence (reference :21-58); six
    # OptionalMatch slots inlined (blob captures for sub-sequences)
    return [
        (f"u0{tag}", "fixed", "user=<"),
        (f"user{tag}", "optional", (f"user{tag}", "pattern", r"[^>]+")),
        (f"u1{tag}", "fixed", ">"),
        (f"method{tag}", "optional",
         (f"method{tag}", "pattern", r", method=[^,]+")),
        (f"u2{tag}", "fixed", ", rip="),
        (f"rip{tag}", "ipv4"),
        (f"u3{tag}", "fixed", ", lip="),
        (f"lip{tag}", "ipv4"),
        (f"mpid{tag}", "optional",
         (f"mpid{tag}", "pattern", r", mpid=(?:0|[1-9]\d*)")),
        (f"sec{tag}", "optional", (f"sec{tag}", "fixed", ", secured")),
        (f"tls{tag}", "optional", (f"tls{tag}", "fixed", ", TLS")),
        (f"hs{tag}", "optional",
         (f"hs{tag}", "pattern", r" handshaking:.+?")),
        (f"u4{tag}", "fixed", ", session=<"),
        (f"session{tag}", "delimited", ">"),
        (f"u5{tag}", "fixed", ">"),
    ]


_AIT_HORDE_TAIL: list[tuple] = [
    ("ht0", "fixed", " [pid "),
    ("hpid", "int"),
    ("ht1", "fixed", " on line "),
    ("hline", "int"),
    ("ht2", "fixed", ' of "'),
    ("hpath", "delimited", '"'),
    ("ht3", "fixed", '"]'),
]


def _ait_pam_session(head: str) -> list[tuple]:
    # pam_unix(...): session opened/closed for user X [by (uid=N)]
    return [
        ("b0", "fixed", head),
        ("pam", "delimited", "("),
        ("b1", "fixed", "("),
        ("pname", "delimited", ")"),
        ("b2", "fixed", "): session "),
        ("status", "wordlist", ["opened", "closed"]),
        ("b3", "fixed", " for user "),
        ("user", "varbyte", _AIT_ALPHA),
        ("uid", "optional", ("uid", "pattern", r" by \(uid=(?:0|[1-9]\d*)\)")),
    ]


def _ait_simple(lit: str, pid: bool, sep: str = "]: ",
                payload: tuple | None = None) -> list[tuple]:
    # " name[pid]<sep><any>" / " name<sep><any>" catch-all branches
    body: list[tuple] = [("svc0", "fixed", lit)]
    if pid:
        body += [("pid", "int"), ("svc1", "fixed", sep)]
    if payload is None:
        payload = ("msg", "any")
    if payload:
        body.append(payload)
    return _ait(body)


SYSLOG_AIT_SPECS: dict[str, list[tuple]] = {}

# --- dovecot: imap(<user>): <message> (reference :65-126) ---
_DOVE_IMAP: list[tuple] = [
    ("d0", "fixed", " dovecot: imap("),
    ("iuser", "delimited", ")"),
    ("d1", "fixed", "): "),
]
SYSLOG_AIT_SPECS["dovecot_imap_logout"] = _ait(_DOVE_IMAP + [
    ("m0", "fixed", "Logged out in="),
    ("inb", "int"),
    ("m1", "fixed", " out="),
    ("outb", "int"),
])
SYSLOG_AIT_SPECS["dovecot_imap_err_mail"] = _ait(_DOVE_IMAP + [
    ("m0", "wordlist",
     ["Error: Failed to autocreate mailbox INBOX: Internal error occurred. "
      "Refer to server log for more information. [",
      "Failed to autocreate mailbox INBOX: Internal error occurred. "
      "Refer to server log for more information. ["]),
    ("err_time", "delimited", "]"),
    ("m1", "fixed", "]"),
])
SYSLOG_AIT_SPECS["dovecot_imap_err_open"] = _ait(_DOVE_IMAP + [
    ("m0", "fixed", "Error: "),
    ("fname", "delimited", "("),
    ("m1", "fixed", "("),
    ("arg", "delimited", ")"),
    ("m2", "fixed", ") failed: Permission denied (euid="),
    ("euid", "int"),
    ("m3", "fixed", "("),
    ("euser", "delimited", ")"),
    ("m4", "fixed", ") egid="),
    ("egid", "int"),
    ("m5", "fixed", "("),
    ("guser", "delimited", ")"),
    ("m6", "fixed", ") missing +w perm: "),
    ("mpath", "delimited", ","),
    ("m7", "fixed", ", we're not in group "),
    ("gid", "int"),
    ("m8", "fixed", "("),
    ("gname", "delimited", ")"),
    ("m9", "fixed", "), dir owned by "),
    ("owner", "delimited", " "),
    ("m10", "fixed", " mode="),
    ("mode", "delimited", ")"),
    ("m11", "fixed", ")"),
    ("setb", "optional", ("setb", "pattern", r" \(set[^=]+=[^)]+\)")),
])

# --- dovecot: imap-login: ... (reference :127-159) ---
_DOVE_LOGIN = [("d0", "fixed", " dovecot: imap-login: ")]
for _dk, _dlit in [
    ("auth_failed", None),
    ("no_auth", "(no auth attempts in "),
    ("before_auth", "(disconnected before auth was ready, waited "),
]:
    if _dlit is None:
        _mid: list[tuple] = [
            ("m0", "fixed", "Disconnected (auth failed, "),
            ("attempts", "int"),
            ("m1", "fixed", " attempts in "),
        ]
    else:
        _mid = [("m0", "fixed", "Disconnected " + _dlit)]
    SYSLOG_AIT_SPECS[f"dovecot_login_disc_{_dk}"] = _ait(
        _DOVE_LOGIN + _mid + [
            ("duration", "int"),
            ("m2", "fixed", " secs): "),
        ] + _ait_user_info())
SYSLOG_AIT_SPECS["dovecot_login_login"] = _ait(_DOVE_LOGIN + [
    ("m0", "fixed", "Login: "),
] + _ait_user_info())
SYSLOG_AIT_SPECS["dovecot_login_anvil"] = _ait(_DOVE_LOGIN + [
    ("m0", "fixed", "Error: anvil:"),
    ("msg", "any"),
])
SYSLOG_AIT_SPECS["dovecot_login_auth_responding"] = _ait(_DOVE_LOGIN + [
    ("m0", "fixed", "Warning: Auth process not responding, "
                    "delayed sending initial response (greeting): "),
] + _ait_user_info())

# --- remaining dovecot sub-branches (reference :160-194) ---
SYSLOG_AIT_SPECS["dovecot_auth"] = _ait([
    ("d0", "fixed", " dovecot: auth: "), ("msg", "any")])
SYSLOG_AIT_SPECS["dovecot_auth_worker"] = _ait([
    ("d0", "fixed", " dovecot: auth-worker("),
    ("pid", "int"),
    ("d1", "fixed", "):"),
    ("msg", "any"),
])
for _dk, _dlit in [("master", "master: "), ("ssl_params", "ssl-params: "),
                   ("log", "log: ")]:
    SYSLOG_AIT_SPECS[f"dovecot_{_dk}"] = _ait([
        ("d0", "fixed", " dovecot: " + _dlit), ("msg", "any")])
SYSLOG_AIT_SPECS["dovecot2_warning"] = _ait([
    ("d0", "fixed", " dovecot["),
    ("pid", "int"),
    ("d1", "fixed", "]: Warning: "),
    ("msg", "any"),
])

# --- chfn (reference :195-202) ---
SYSLOG_AIT_SPECS["chfn"] = _ait([
    ("s0", "fixed", " chfn["),
    ("pid", "int"),
    ("s1", "fixed", "]: changed user '"),
    ("user", "delimited", "'"),
    ("s2", "fixed", "' information"),
])

# --- HORDE (reference :203-326); every branch ends in _AIT_HORDE_TAIL ---
_HORDE = [("h0", "fixed", " HORDE: ")]
SYSLOG_AIT_SPECS["horde_imp_login"] = _ait(_HORDE + [
    ("h1", "fixed", "[imp] Login success for "),
    ("user", "delimited", " "),
    ("h2", "fixed", " ("),
    ("ip", "delimited", ")"),
    ("fwd", "optional", ("fwd", "pattern", r"\) \([^)]+")),
    ("h3", "fixed", ") to {"),
    ("imap_addr", "delimited", "}"),
    ("h4", "fixed", "}"),
] + _AIT_HORDE_TAIL)
SYSLOG_AIT_SPECS["horde_imp_message_sent"] = _ait(_HORDE + [
    ("h1", "fixed", "[imp] Message sent to "),
    ("recepients", "delimited", " from"),
    ("h2", "fixed", " from "),
    ("user", "delimited", " "),
    ("h3", "fixed", " ("),
    ("ip", "ipv4"),
    ("h4", "fixed", ")"),
] + _AIT_HORDE_TAIL)
SYSLOG_AIT_SPECS["horde_imp_login_failed"] = _ait(_HORDE + [
    ("h1", "fixed", "[imp] FAILED LOGIN for "),
    ("user", "delimited", " "),
    ("h2", "fixed", " ("),
    ("ip", "ipv4"),
    ("h3", "fixed", ") to {"),
    ("imap_addr", "delimited", "}"),
    ("h4", "fixed", "}"),
] + _AIT_HORDE_TAIL)
SYSLOG_AIT_SPECS["horde_imp_status"] = _ait(_HORDE + [
    ("h1", "fixed", '[imp] [status] Could not open mailbox "INBOX".'),
] + _AIT_HORDE_TAIL)
SYSLOG_AIT_SPECS["horde_imp_sync_token"] = _ait(_HORDE + [
    ("h1", "fixed", "[imp] [getSyncToken] IMAP error reported by server."),
] + _AIT_HORDE_TAIL)
SYSLOG_AIT_SPECS["horde_imp_auth_failed"] = _ait(_HORDE + [
    ("h1", "fixed", "[imp] ["),
    ("type", "delimited", "]"),
    ("h2", "fixed", "] Authentication failed."),
] + _AIT_HORDE_TAIL)
SYSLOG_AIT_SPECS["horde_horde_login"] = _ait(_HORDE + [
    ("h1", "fixed", "[horde] Login success for "),
    ("user", "delimited", " "),
    ("h2", "fixed", " to horde ("),
    ("ip", "ipv4"),
    ("h3", "fixed", ")"),
] + _AIT_HORDE_TAIL)
SYSLOG_AIT_SPECS["horde_horde_logout"] = _ait(_HORDE + [
    ("h1", "fixed", "[horde] User "),
    ("user", "delimited", " "),
    ("h2", "fixed", " logged out of Horde ("),
    ("ip", "ipv4"),
    ("h3", "fixed", ")"),
] + _AIT_HORDE_TAIL)
SYSLOG_AIT_SPECS["horde_horde_login_failed"] = _ait(_HORDE + [
    ("h1", "fixed", "[horde] FAILED LOGIN for "),
    ("user", "delimited", " "),
    ("h2", "fixed", " to horde ("),
    ("ip", "ipv4"),
    ("h3", "fixed", ")"),
] + _AIT_HORDE_TAIL)
_HORDE_FN = [
    ("h1", "wordlist", ["[nag]", "[turba]", "[horde]"]),
    ("h2", "fixed", " PHP ERROR: "),
]
SYSLOG_AIT_SPECS["horde_fn_declaration"] = _ait(_HORDE + _HORDE_FN + [
    ("h3", "fixed", "Declaration of "),
    ("fn1", "delimited", "("),
    ("h4", "fixed", "("),
    ("arg1", "optional", ("arg1", "pattern", r"[^)]+")),
    ("h5", "fixed", ") should be compatible with "),
    ("fn2", "delimited", "("),
    ("h6", "fixed", "("),
    ("arg2", "optional", ("arg2", "pattern", r"[^)]+")),
    ("h7", "fixed", ")"),
] + _AIT_HORDE_TAIL)
SYSLOG_AIT_SPECS["horde_fn_finfo"] = _ait(_HORDE + _HORDE_FN + [
    ("h3", "fixed", "finfo_file(): Empty filename or path"),
] + _AIT_HORDE_TAIL)
SYSLOG_AIT_SPECS["horde_fn_headers"] = _ait(_HORDE + _HORDE_FN + [
    ("h3", "fixed", "Cannot modify header information - "
                    "headers already sent"),
] + _AIT_HORDE_TAIL)
SYSLOG_AIT_SPECS["horde_guest"] = _ait(_HORDE + [
    ("h1", "fixed", "Guest user is not authorized for Horde (Host: "),
    ("ip", "ipv4"),
    ("h2", "fixed", ")."),
] + _AIT_HORDE_TAIL)
SYSLOG_AIT_SPECS["horde_php_error"] = _ait(_HORDE + [
    ("h1", "fixed", "PHP ERROR: "),
    ("msg", "pattern", _NO_SP_LBRACK),
] + _AIT_HORDE_TAIL)
SYSLOG_AIT_SPECS["horde_free_msg"] = _ait(_HORDE + [
    ("msg", "pattern", _NO_SP_LBRACK),
] + _AIT_HORDE_TAIL)

# --- useradd / groupadd / chpasswd / usermod / chage (ref :327-422) ---
_UADD_NEW_USER: list[tuple] = [
    ("m0", "fixed", "new user: name="),
    ("user", "delimited", ","),
    ("m1", "fixed", ", UID="),
    ("nuid", "int"),
    ("m2", "fixed", ", GID="),
    ("ngid", "int"),
    ("m3", "fixed", ", home="),
    ("home", "delimited", ","),
    ("m4", "fixed", ", shell="),
    ("shell", "varbyte", _AIT_ALPHA),
]
_UADD_NEW_GROUP: list[tuple] = [
    ("m0", "fixed", "new group: name="),
    ("group", "delimited", ","),
    ("m1", "fixed", ", GID="),
    ("ngid", "int"),
]


def _ait_tool(name: str) -> list[tuple]:
    return [
        ("s0", "fixed", f" {name}["),
        ("pid", "int"),
        ("s1", "fixed", "]: "),
    ]


SYSLOG_AIT_SPECS["useradd_cmd"] = _ait(_ait_tool("useradd") + [
    ("m0", "fixed", "add '"),
    ("user", "delimited", "'"),
    ("m1", "fixed", "' to "),
    ("shadow", "optional", ("shadow", "fixed", "shadow ")),
    ("m2", "fixed", "group '"),
    ("group", "delimited", "'"),
    ("m3", "fixed", "'"),
])
SYSLOG_AIT_SPECS["useradd_new_user"] = _ait(
    _ait_tool("useradd") + _UADD_NEW_USER)
SYSLOG_AIT_SPECS["useradd_new_group"] = _ait(
    _ait_tool("useradd") + _UADD_NEW_GROUP)
SYSLOG_AIT_SPECS["groupadd_cmd_gid"] = _ait(_ait_tool("groupadd") + [
    ("m0", "fixed", "group added to "),
    ("gpath", "delimited", ":"),
    ("m1", "fixed", ": name="),
    ("group", "delimited", ","),
    ("m2", "fixed", ", GID="),
    ("ngid", "int"),
])
SYSLOG_AIT_SPECS["groupadd_cmd_any"] = _ait(_ait_tool("groupadd") + [
    ("m0", "fixed", "group added to "),
    ("gpath", "delimited", ":"),
    ("m1", "fixed", ": name="),
    ("group", "any"),
])
SYSLOG_AIT_SPECS["groupadd_new_user"] = _ait(
    _ait_tool("groupadd") + _UADD_NEW_USER)
SYSLOG_AIT_SPECS["groupadd_new_group"] = _ait(
    _ait_tool("groupadd") + _UADD_NEW_GROUP)
SYSLOG_AIT_SPECS["chpasswd"] = _ait(_ait_tool("chpasswd") + [
    ("m0", "fixed", "pam_unix("),
    ("pname", "delimited", ")"),
    ("m1", "fixed", "): password changed for "),
    ("user", "any"),
])
SYSLOG_AIT_SPECS["usermod"] = _ait(_ait_tool("usermod") + [
    ("m0", "fixed", "change user '"),
    ("user", "delimited", "'"),
    ("m1", "fixed", "' password"),
])
SYSLOG_AIT_SPECS["chage"] = _ait(_ait_tool("chage") + [
    ("m0", "fixed", "changed password expiry for "),
    ("user", "any"),
])

# --- cron / crontab (reference :423-476) ---
_AIT_CRON_HEAD: list[tuple] = [
    ("s0", "wordlist", [" CRON[", " cron["]),
    ("pid", "int"),
    ("s1", "fixed", "]: "),
]
SYSLOG_AIT_SPECS["cron_cmd"] = _ait(_AIT_CRON_HEAD + [
    ("m0", "fixed", "("),
    ("user", "delimited", ")"),
    ("m1", "fixed", ") CMD "),
    ("cmd_msg", "any"),
])
SYSLOG_AIT_SPECS["cron_session"] = _ait(_AIT_CRON_HEAD + [
    ("pam", "delimited", "("),
    ("m0", "fixed", "("),
    ("pname", "delimited", ")"),
    ("m1", "fixed", "): session "),
    ("status", "wordlist", ["opened", "closed"]),
    ("m2", "fixed", " for user "),
    ("user", "varbyte", _AIT_ALPHA),
    ("uid", "optional", ("uid", "pattern", r" by \(uid=(?:0|[1-9]\d*)\)")),
])
SYSLOG_AIT_SPECS["cron_pidfile"] = _ait(_AIT_CRON_HEAD + [
    ("m0", "fixed", "(CRON) INFO (pidfile fd = "),
    ("fd", "int"),
    ("m1", "fixed", ")"),
])
SYSLOG_AIT_SPECS["cron_no_mta"] = _ait(_AIT_CRON_HEAD + [
    ("m0", "fixed", "(CRON) info (No MTA installed, discarding output)")])
SYSLOG_AIT_SPECS["cron_reboot"] = _ait(_AIT_CRON_HEAD + [
    ("m0", "fixed", "(CRON) INFO (Running @reboot jobs)")])
SYSLOG_AIT_SPECS["crontab_command"] = _ait(_ait_tool("crontab") + [
    ("m0", "fixed", "("),
    ("user", "delimited", ")"),
    ("m1", "fixed", ") "),
    ("command", "wordlist", ["REPLACE", "LIST"]),
    ("m2", "fixed", " ("),
    ("tuser", "delimited", ")"),
    ("m3", "fixed", ")"),
])
SYSLOG_AIT_SPECS["crontab_no_mta"] = _ait(_ait_tool("crontab") + [
    ("m0", "fixed", "(CRON) info (No MTA installed, discarding output)")])
SYSLOG_AIT_SPECS["crontab_reboot"] = _ait(_ait_tool("crontab") + [
    ("m0", "fixed", "(CRON) INFO (Running @reboot jobs)")])

# --- sudo / auth (reference :477-506) ---
SYSLOG_AIT_SPECS["sudo"] = _ait_simple(" sudo: ", False)
SYSLOG_AIT_SPECS["auth_failure"] = _ait([
    ("s0", "fixed", " auth: "),
    ("pam", "delimited", "("),
    ("m0", "fixed", "("),
    ("pname", "delimited", ")"),
    ("m1", "fixed", "): authentication failure; logname="),
    ("logname", "optional", ("logname", "pattern", r"[^ ]+")),
    ("m2", "fixed", " uid="),
    ("uid", "int"),
    ("m3", "fixed", " euid="),
    ("euid", "int"),
    ("m4", "fixed", " tty="),
    ("tty", "delimited", " "),
    ("m5", "fixed", " ruser="),
    ("ruser", "delimited", " "),
    ("m6", "fixed", " rhost="),
    ("rhost", "ipv4"),
    ("user", "optional", ("user", "pattern",
     r"  user=[" + __import__("re").escape(_AIT_ALPHA) + r"]+")),
])

# --- systemd family (reference :507-554) ---
SYSLOG_AIT_SPECS["systemd"] = _ait_simple(" systemd[", True)
SYSLOG_AIT_SPECS["systemd2_session"] = _ait(
    _ait_pam_session(" systemd: "))
SYSLOG_AIT_SPECS["systemd_modules_load"] = _ait([
    ("s0", "fixed", " systemd-modules-load["),
    ("pid", "int"),
    ("s1", "fixed", "]: Inserted module '"),
    ("module", "delimited", "'"),
    ("s2", "fixed", "'"),
])
SYSLOG_AIT_SPECS["systemd_networkd_wait_online"] = _ait([
    ("s0", "fixed", " systemd-networkd-wait-online["),
    ("pid", "int"),
    ("s1", "fixed", "]: "),
    ("mode", "wordlist", ["managing", "ignoring"]),
    ("s2", "fixed", ": "),
    ("interface", "any"),
])
SYSLOG_AIT_SPECS["systemd_fsck"] = _ait_simple(" systemd-fsck[", True)
SYSLOG_AIT_SPECS["systemd_udevd"] = _ait_simple(" systemd-udevd[", True)

# --- sshd (reference :555-637; distinct from SshdParsingModel) ---
_AIT_SSHD = _ait_tool("sshd")
SYSLOG_AIT_SPECS["sshd_pam_session"] = _ait(_AIT_SSHD + [
    ("m0", "fixed", "pam_unix("),
    ("pname", "delimited", ")"),
    ("m1", "fixed", "): session "),
    ("status", "wordlist", ["opened", "closed"]),
    ("m2", "fixed", " for user "),
    ("user", "varbyte", _AIT_ALPHA),
    ("uid", "optional", ("uid", "pattern", r" by \(uid=(?:0|[1-9]\d*)\)")),
])
SYSLOG_AIT_SPECS["sshd_pam_passwd"] = _ait(_AIT_SSHD + [
    ("m0", "fixed", "pam_unix("),
    ("pname", "delimited", ")"),
    ("m1", "fixed", "): password changed for "),
    ("group", "any"),
])
SYSLOG_AIT_SPECS["sshd_publickey"] = _ait(_AIT_SSHD + [
    ("m0", "fixed", "Accepted publickey for "),
    ("user", "delimited", " "),
    ("m1", "fixed", " from "),
    ("ip", "ipv4"),
    ("m2", "fixed", " port "),
    ("port", "int"),
    ("m3", "fixed", " ssh2: RSA "),
    ("rsa", "any"),
])
SYSLOG_AIT_SPECS["sshd_ident"] = _ait(_AIT_SSHD + [
    ("m0", "fixed", "Did not receive identification string from "),
    ("ip", "ipv4"),
    ("m1", "fixed", " port "),
    ("port", "int"),
])
SYSLOG_AIT_SPECS["sshd_listening"] = _ait(_AIT_SSHD + [
    ("m0", "fixed", "Server listening on "),
    ("ip", "delimited", " "),
    ("m1", "fixed", " port "),
    ("port", "int"),
    ("m2", "fixed", "."),
])
SYSLOG_AIT_SPECS["sshd_signal"] = _ait(_AIT_SSHD + [
    ("m0", "fixed", "Received signal"),
    ("remainder", "any"),
])
SYSLOG_AIT_SPECS["sshd_rec_disconnect"] = _ait(_AIT_SSHD + [
    ("m0", "fixed", "Received disconnect from "),
    ("ip", "ipv4"),
    ("m1", "fixed", " port "),
    ("port", "int"),
    ("remainder", "any"),
])
SYSLOG_AIT_SPECS["sshd_disconnected_user"] = _ait(_AIT_SSHD + [
    ("m0", "fixed", "Disconnected from user "),
    ("user", "delimited", " "),
    ("m1", "fixed", " "),
    ("ip", "ipv4"),
    ("m2", "fixed", " port "),
    ("port", "int"),
])
SYSLOG_AIT_SPECS["sshd_disconnected"] = _ait(_AIT_SSHD + [
    ("m0", "fixed", "Disconnected from "),
    ("user", "optional", ("user", "pattern", r"user [^ ]+ ")),
    ("ip", "ipv4"),
    ("m1", "fixed", " port "),
    ("port", "int"),
])
SYSLOG_AIT_SPECS["sshd_timeout"] = _ait(_AIT_SSHD + [
    ("m0", "fixed", "Timeout, client not responding.")])

# --- su (reference :639-670) ---
_AIT_SU = _ait_tool("su")
SYSLOG_AIT_SPECS["su_pam_session"] = _ait(_AIT_SU + [
    ("m0", "fixed", "pam_unix("),
    ("pname", "delimited", ")"),
    ("m1", "fixed", "): session "),
    ("status", "wordlist", ["opened", "closed"]),
    ("m2", "fixed", " for user "),
    ("user", "varbyte", _AIT_ALPHA),
    ("uid", "optional", ("uid", "pattern", r" by \(uid=(?:0|[1-9]\d*)\)")),
])
SYSLOG_AIT_SPECS["su_successful"] = _ait(_AIT_SU + [
    ("m0", "fixed", "Successful su for "),
    ("user", "varbyte", _AIT_ALPHA),
    ("m1", "fixed", " by "),
    ("su_user", "varbyte", _AIT_ALPHA),
])
SYSLOG_AIT_SPECS["su_plus"] = _ait(_AIT_SU + [
    ("m0", "fixed", "+"),
    ("msg", "any"),
])

# --- kernel (optional [id]) + audit daemons (reference :671-702) ---
SYSLOG_AIT_SPECS["kernel_id"] = _ait([
    ("s0", "fixed", " kernel["),
    ("kid", "int"),
    ("s1", "fixed", "]: "),
    ("kernel_msg", "any"),
])
SYSLOG_AIT_SPECS["kernel"] = _ait([
    ("s0", "fixed", " kernel: "),
    ("kernel_msg", "any"),
])
SYSLOG_AIT_SPECS["augenrules"] = _ait_simple(" augenrules[", True)
SYSLOG_AIT_SPECS["auditd"] = _ait_simple(" auditd[", True)
SYSLOG_AIT_SPECS["auditd2"] = _ait_simple(" auditd: ", False)
SYSLOG_AIT_SPECS["audispd"] = _ait_simple(" audispd: ", False)

# --- boot-probe / logger one-liners (reference :703-746) ---
for _sk, _slit in [
    ("liblogging", " liblogging-stdlog: "), ("os_prober", " os-prober: "),
    ("macosx_prober", " macosx-prober: "), ("haiku", " 83haiku: "),
    ("efi", " 05efi: "), ("freedos", " 10freedos: "), ("qnx", " 10qnx: "),
    ("microsoft", " 20microsoft: "), ("utility", " 30utility: "),
    ("mounted_tests", " 50mounted-tests: "), ("rsyslogd", " rsyslogd: "),
]:
    SYSLOG_AIT_SPECS[_sk] = _ait_simple(_slit, False)
SYSLOG_AIT_SPECS["timesyncd"] = _ait_simple(" systemd-timesyncd[", True)

# --- systemd-logind (reference :753-774) ---
_AIT_LOGIND = [
    ("s0", "fixed", " systemd-logind["),
    ("pid", "int"),
    ("s1", "fixed", "]: "),
]
SYSLOG_AIT_SPECS["logind_new"] = _ait(_AIT_LOGIND + [
    ("m0", "fixed", "New session "),
    ("session", "delimited", " "),
    ("m1", "fixed", " of user"),
    ("user", "any"),
])
SYSLOG_AIT_SPECS["logind_removed"] = _ait(_AIT_LOGIND + [
    ("m0", "fixed", "Removed session "),
    ("session", "int"),
    ("m1", "fixed", "."),
])
SYSLOG_AIT_SPECS["logind_buttons"] = _ait(_AIT_LOGIND + [
    ("m0", "fixed", "Watching system buttons on /dev/input/event"),
    ("event_type", "any"),
])
SYSLOG_AIT_SPECS["logind_new_seat"] = _ait(_AIT_LOGIND + [
    ("m0", "fixed", "New seat seat0.")])

# --- "]:"-separated daemons, no space (reference :775-804) ---
for _sk, _slit in [
    ("grub", " grub-common["), ("polkitd", " polkitd["),
    ("dbus", " dbus-daemon["), ("hostnamed", " systemd-hostnamed["),
    ("apport", " apport["),
]:
    SYSLOG_AIT_SPECS[_sk] = _ait_simple(_slit, True, sep="]:")
SYSLOG_AIT_SPECS["resolved"] = _ait_simple(" systemd-resolved[", True)
SYSLOG_AIT_SPECS["networkd"] = _ait_simple(" systemd-networkd[", True)
SYSLOG_AIT_SPECS["networkd_dispatcher"] = _ait([
    ("s0", "fixed", " networkd-dispatcher["),
    ("pid", "int"),
    ("s1", "fixed", "]: No valid path found for "),
    ("interface", "any"),
])
SYSLOG_AIT_SPECS["motd"] = _ait_simple(" 50-motd-news[", True)
SYSLOG_AIT_SPECS["freshclam"] = _ait_simple(" freshclam[", True)

# --- dhclient (reference :836-871): payload is OPTIONAL ---
_AIT_DHCLIENT = [
    ("s0", "fixed", " dhclient["),
    ("pid", "int"),
    ("s1", "fixed", "]: "),
]
SYSLOG_AIT_SPECS["dhclient_request"] = _ait(_AIT_DHCLIENT + [
    ("m0", "fixed", "DHCPREQUEST of "),
    ("src_ip", "ipv4"),
    ("m1", "fixed", " on "),
    ("iface", "delimited", " "),
    ("m2", "fixed", " to "),
    ("dst_ip", "ipv4"),
    ("m3", "fixed", " port "),
    ("port", "int"),
    # optional xid sub-seq; HexStringModelElement default = LOWERCASE
    ("xid", "optional", ("xid", "pattern", r" \(xid=0x[0-9a-f]+\)")),
])
SYSLOG_AIT_SPECS["dhclient_ack"] = _ait(_AIT_DHCLIENT + [
    ("m0", "fixed", "DHCPACK of "),
    ("dst_ip", "ipv4"),
    ("m1", "fixed", " from "),
    ("src_ip", "ipv4"),
])
SYSLOG_AIT_SPECS["dhclient_bound"] = _ait(_AIT_DHCLIENT + [
    ("m0", "fixed", "bound to "),
    ("ip", "ipv4"),
    ("m1", "fixed", " -- renewal in "),
    ("seconds", "int"),
    ("m2", "fixed", " seconds."),
])
SYSLOG_AIT_SPECS["dhclient_any"] = _ait(_AIT_DHCLIENT + [
    ("skipped_msg", "any")])
SYSLOG_AIT_SPECS["dhclient_empty"] = _ait(list(_AIT_DHCLIENT))

# --- remaining daemons (reference :872-1006) ---
SYSLOG_AIT_SPECS["apparmor"] = _ait_simple(" apparmor[", True)
SYSLOG_AIT_SPECS["snapd_apparmor"] = _ait_simple(" snapd-apparmor[", True)
SYSLOG_AIT_SPECS["snapd"] = _ait_simple(" snapd[", True)
SYSLOG_AIT_SPECS["cloud_init_pid"] = _ait([
    ("s0", "fixed", " cloud-init["),
    ("pid", "int"),
    ("s1", "fixed", "]: "),
    ("msg", "any"),
])
SYSLOG_AIT_SPECS["cloud_init"] = _ait_simple(" cloud-init: ", False)
SYSLOG_AIT_SPECS["irqbalance"] = _ait([
    ("s0", "fixed", " /usr/sbin/irqbalance"),
    ("msg", "any"),
])
SYSLOG_AIT_SPECS["pollinate"] = _ait_simple(" pollinate[", True)
SYSLOG_AIT_SPECS["lxcfs"] = _ait_simple(" lxcfs[", True)
SYSLOG_AIT_SPECS["accounts_daemon"] = _ait_simple(" accounts-daemon[", True)
SYSLOG_AIT_SPECS["ec2"] = _ait([
    ("s0", "fixed", " ec2: "),
    ("msg", "optional", ("msg", "pattern", r".+")),
])
SYSLOG_AIT_SPECS["dnsmasq"] = _ait_simple(" dnsmasq[", True)
for _sk, _slit in [("etc_maradns_mararc", " etc_maradns_mararc["),
                   ("etc_maradns_mararc_zs", " etc_maradns_mararc-zs[")]:
    SYSLOG_AIT_SPECS[_sk] = _ait([
        ("s0", "fixed", _slit),
        ("pid", "int"),
        ("s1", "fixed", "]: "),
        ("msg", "optional", ("msg", "pattern", r".+")),
    ])
SYSLOG_AIT_SPECS["ifup"] = _ait_simple(" ifup[", True)
SYSLOG_AIT_SPECS["root"] = _ait_simple(" root: ", False)
SYSLOG_AIT_SPECS["ntpd"] = _ait_simple(" ntpd[", True)
SYSLOG_AIT_SPECS["ntp"] = _ait_simple(" ntp[", True)
SYSLOG_AIT_SPECS["exim4_pid"] = _ait([
    ("s0", "fixed", " exim4["),
    ("pid", "int"),
    ("s1", "fixed", "]: "),
    ("msg", "any"),
])
SYSLOG_AIT_SPECS["exim4"] = _ait_simple(" exim4: ", False)
SYSLOG_AIT_SPECS["mysqld_safe"] = _ait_simple(" mysqld_safe[", True)
SYSLOG_AIT_SPECS["mysqld"] = _ait_simple(" mysqld[", True)
SYSLOG_AIT_SPECS["php70"] = _ait([
    ("s0", "fixed", " php7.0-"),
    ("service", "delimited", ":"),
    ("s1", "fixed", ": "),
    ("msg", "any"),
])
SYSLOG_AIT_SPECS["libapache2_mod_php70"] = _ait_simple(
    " libapache2-mod-php7.0: ", False)
SYSLOG_AIT_SPECS["php"] = _ait([
    ("s0", "fixed", " php-"),
    ("service", "delimited", ":"),
    ("s1", "fixed", ": "),
    ("msg", "any"),
])
SYSLOG_AIT_SPECS["apache2_postinst"] = _ait_simple(
    " apache2.postinst: ", False)
SYSLOG_AIT_SPECS["smbd"] = _ait_simple(" smbd[", True)
SYSLOG_AIT_SPECS["ut"] = _ait_simple(" ut[", True)
SYSLOG_AIT_SPECS["apachectl"] = _ait(_ait_tool("apachectl") + [
    ("m0", "fixed", "AH00548: NameVirtualHost has no effect and will be "
                    "removed in the next release "),
    ("cfg_path", "any"),
])
