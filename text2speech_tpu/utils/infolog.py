"""Run logging: stdout + append-to-file + optional Slack webhook
(``/root/reference/utils/infolog.py:1-50``)."""

from __future__ import annotations

import atexit
import json
import threading
from datetime import datetime
from urllib.request import Request, urlopen

_file = None
_run_name = None
_slack_url = None


def init(path: str, run_name: str, slack_url: str | None = None) -> None:
    global _file, _run_name, _slack_url
    close()
    _file = open(path, "a", encoding="utf-8")
    _file.write("\n-----------------------------------------------------------------\n")
    _file.write("Starting new training run\n")
    _file.write("-----------------------------------------------------------------\n")
    _run_name = run_name
    _slack_url = slack_url


def log(msg: str, slack: bool = False) -> None:
    print(msg)
    if _file is not None:
        _file.write("[%s]  %s\n" % (datetime.now().strftime("%H:%M:%S"), msg))
        _file.flush()
    if slack and _slack_url is not None:
        threading.Thread(target=_send_slack, args=(msg,), daemon=True).start()


def _send_slack(msg: str) -> None:
    try:
        req = Request(_slack_url)
        req.add_header("Content-Type", "application/json")
        urlopen(
            req,
            json.dumps(
                {"username": "t2s-tpu-trainer", "icon_emoji": ":loud_sound:",
                 "text": "[%s] %s" % (_run_name, msg)}
            ).encode(),
        )
    except Exception:
        pass  # logging must never take down training


def close() -> None:
    global _file
    if _file is not None:
        _file.close()
        _file = None


atexit.register(close)
