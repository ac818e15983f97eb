"""Synthetic Seattle call-data CSV fixture (FIXTURES.md §1).

Deterministic rows engineered to exercise every transform branch:
AM/PM + already-24-hour + malformed timestamps, null arrival times,
null in-service times (event-level cascade), disjoint SPD/CARE nulls,
null priority/sector, multi-dispatch events.
"""

from __future__ import annotations

import csv

HEADER = [
    "CAD Event Number",
    "Call Sign Dispatch ID",
    "Call Type",
    "Initial Call Type",
    "Final Call Type",
    "Priority",
    "CAD Event Clearance Description",
    "CAD Event Response Category",
    "Call Type Indicator",
    "Call Type Received Classification",
    "Dispatch Precinct",
    "Dispatch Sector",
    "Dispatch Beat",
    "Dispatch Neighborhood",
    "Dispatch Longitude",
    "Dispatch Latitude",
    "Dispatch Reporting Area",
    "CAD Event Original Time Queued",
    "CAD Event Arrived Time",
    "Call Sign Dispatch Time",
    "Call Sign at Scene Time",
    "Call Sign In-Service Time",
    "First CARE Call Sign At Scene Time",
    "First CARE Call Sign Dispatch Time",
    "First SPD Call Sign at Scene Time",
    "First SPD Call Sign Dispatch Time",
    "First Co-Response Call Sign At Scene Time",
    "First Co-Response Call Sign Dispatch Time",
    "Last CARE Call Sign In-Service Time",
    "Last Co-Response Call Sign In-Service Time",
    "Last SPD Call Sign In-Service Time",
    "CARE Call Sign Total Service Time (s)",
    "SPD Call Sign Total Service Time (s)",
    "First CARE Call Sign Dispatch Delay Time (s)",
    "First SPD Call Sign Dispatch Delay Time (s)",
    "First CARE Call Sign Response Time (s)",
    "First SPD Call Sign Response Time (s)",
    "First Co-Response Call Sign Dispatch Delay Time (s)",
    "First Co-Response Call Sign Response Time (s)",
    "Call Sign Dispatch Delay Time (s)",
    "Call Sign Response Time (s)",
    "Call Sign Total Service Time (s)",
    "CAD Event First Response Time (s)",
]


def _row(
    event: str,
    unit: str,
    queued: str,
    arrived: str = "05/12/2024 01:05:00 PM",
    dispatch: str = "05/12/2024 01:10:00 PM",
    at_scene: str = "05/12/2024 01:20:00 PM",
    in_service: str = "05/12/2024 02:00:00 PM",
    spd_scene: str = "",
    care_scene: str = "05/12/2024 01:18:00 PM",
    priority: str = "2",
    sector: str = "KING",
    response_s: str = "600",
) -> dict[str, str]:
    r = dict.fromkeys(HEADER, "")
    r.update(
        {
            "CAD Event Number": event,
            "Call Sign Dispatch ID": f"{unit}{event}",
            "Call Type": "911",
            "Initial Call Type": "DISTURBANCE",
            "Final Call Type": "DISTURBANCE",
            "Priority": priority,
            "CAD Event Clearance Description": "REPORT WRITTEN",
            "CAD Event Response Category": "CHARLIE",
            "Call Type Indicator": "911",
            "Call Type Received Classification": "CALL",
            "Dispatch Precinct": "NORTH",
            "Dispatch Sector": sector,
            "Dispatch Beat": "K1",
            "Dispatch Neighborhood": "NORTHGATE",
            "Dispatch Longitude": "-122.3",
            "Dispatch Latitude": "47.6",
            "Dispatch Reporting Area": "1234",
            "CAD Event Original Time Queued": queued,
            "CAD Event Arrived Time": arrived,
            "Call Sign Dispatch Time": dispatch,
            "Call Sign at Scene Time": at_scene,
            "Call Sign In-Service Time": in_service,
            "First CARE Call Sign At Scene Time": care_scene,
            "First CARE Call Sign Dispatch Time": "05/12/2024 01:11:00 PM",
            "First SPD Call Sign at Scene Time": spd_scene,
            "First SPD Call Sign Dispatch Time": "",
            "First Co-Response Call Sign At Scene Time": "05/12/2024 01:25:00 PM",
            "First Co-Response Call Sign Dispatch Time": "05/12/2024 01:12:00 PM",
            "Last CARE Call Sign In-Service Time": "05/12/2024 01:50:00 PM",
            "Last Co-Response Call Sign In-Service Time": "05/12/2024 01:55:00 PM",
            "Last SPD Call Sign In-Service Time": "",
            "CARE Call Sign Total Service Time (s)": "2400",
            "SPD Call Sign Total Service Time (s)": "1800",
            "First CARE Call Sign Dispatch Delay Time (s)": "60",
            "First SPD Call Sign Dispatch Delay Time (s)": "90",
            "First CARE Call Sign Response Time (s)": "480",
            "First SPD Call Sign Response Time (s)": "520",
            "First Co-Response Call Sign Dispatch Delay Time (s)": "120",
            "First Co-Response Call Sign Response Time (s)": "780",
            "Call Sign Dispatch Delay Time (s)": "300",
            "Call Sign Response Time (s)": response_s,
            "Call Sign Total Service Time (s)": "3000",
            "CAD Event First Response Time (s)": "540",
        }
    )
    return r


def rows() -> list[dict[str, str]]:
    out = [
        # plain AM/PM event, two dispatch rows (multi-dispatch)
        _row("2024000001", "E01", "05/12/2024 01:00:00 PM"),
        _row("2024000001", "E02", "05/12/2024 01:00:00 PM", response_s=""),
        # already-24-hour timestamps (UDF pass-through branch)
        _row(
            "2024000002",
            "L05",
            "05/12/2024 13:00:00",
            arrived="05/12/2024 13:05:00",
            dispatch="05/12/2024 13:10:00",
            at_scene="05/12/2024 13:20:00",
            in_service="05/12/2024 14:00:00",
        ),
        # 12 AM edge case (hour 12 AM → 00)
        _row(
            "2024000003",
            "N07",
            "05/12/2024 12:05:00 AM",
            arrived="05/12/2024 12:10:00 AM",
            dispatch="05/12/2024 12:15:00 AM",
            at_scene="05/12/2024 12:25:00 AM",
            in_service="05/12/2024 01:00:00 AM",
        ),
        # null at-scene, SPD scene present AND after dispatch → repaired from
        # first_response (SPD preferred over CARE by the merge)
        _row(
            "2024000004",
            "Q09",
            "05/12/2024 01:00:00 PM",
            at_scene="",
            spd_scene="05/12/2024 01:22:00 PM",
            care_scene="",
        ),
        # null at-scene, no first-response at all → repaired from dispatch
        _row("2024000005", "R11", "05/12/2024 01:00:00 PM", at_scene="", care_scene=""),
        # null arrival → row dropped
        _row("2024000006", "S13", "05/12/2024 01:00:00 PM", arrived=""),
        # null in-service on ONE row → BOTH rows of the event cascade-dropped
        _row("2024000007", "T15", "05/12/2024 01:00:00 PM", in_service=""),
        _row("2024000007", "T16", "05/12/2024 01:00:00 PM"),
        # malformed queued timestamp (stays null after parse ladder)
        _row("2024000008", "U17", "not a time", priority="", sector=""),
    ]
    return out


def write_fixture_csv(path: str) -> int:
    data = rows()
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=HEADER)
        w.writeheader()
        w.writerows(data)
    return len(data)
