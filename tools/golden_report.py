#!/usr/bin/env python3
"""Generate golden email-report fixtures for ReportFormatSpec.

Replicates the reference's formatting logic (report.py:286-418 of
monozoide/MailLogSentinel) over two fixed fixtures, so the Scala
renderer can be byte-diffed against the authoritative layout.
Run: python3 tools/golden_report.py  (writes src/test/resources/)
"""
import os


def render(script_name, script_version, extraction_freq, now_stamp,
           ipaddr, fqdn, stats, csv_filename):
    header_content_lines = [
        f"{script_name} {script_version}",
        f"Extraction interval : {extraction_freq}",
        f"Report at {now_stamp}",
        f"Server: {ipaddr} ({fqdn})",
    ]
    max_len = max(len(line) for line in header_content_lines)
    border_line = "#" * (max_len + 6)
    header = [border_line]
    for line_content in header_content_lines:
        header.append(f"### {line_content.ljust(max_len)} ###")
    header.append(border_line)
    header.append("")

    body = []
    body.append(f"Total attempts today: {stats['total_today']}")
    body.append("")
    body.append("Top 10 failed authentications today:")
    if stats["top10_today"]:
        max_user_len, max_ip_len, max_hostn_len = 4, 2, 8
        max_country_len, max_count_len = 2, 5
        for (user, ip, hostn, country), cnt in stats["top10_today"]:
            max_user_len = max(max_user_len, len(user))
            max_ip_len = max(max_ip_len, len(ip))
            max_hostn_len = max(max_hostn_len, len(hostn))
            max_country_len = max(max_country_len,
                                  len(country if country else ""))
            max_count_len = max(max_count_len, len(str(cnt)))
        for idx, ((user, ip, hostn, country), cnt) in enumerate(
                stats["top10_today"], 1):
            country_str = country if country else "N/A"
            body.append(
                f"  {idx:>2d}. {user:<{max_user_len}}  {ip:<{max_ip_len}}  "
                f"{hostn:<{max_hostn_len}}  {country_str:<{max_country_len}}  "
                f"{str(cnt):>{max_count_len}} times")
    else:
        body.append("  (no entries for today)")

    body.append("")
    body.append("Top 10 Usernames today:")
    top10_usernames = stats.get("top10_usernames", [])
    if top10_usernames:
        max_username_len, max_username_count_len = 4, 5
        for username, count in top10_usernames:
            max_username_len = max(max_username_len, len(username))
            max_username_count_len = max(max_username_count_len,
                                         len(str(count)))
        for idx, (username, count) in enumerate(top10_usernames, 1):
            body.append(
                f"  {idx:>2d}. {username:<{max_username_len}}  "
                f"{str(count):>{max_username_count_len}} times")
    else:
        body.append("  (no specific username stats for today)")

    for cat_key, cat_title in [
        ("top10_countries", "Top 10 countries today:"),
        ("top10_aso", "Top 10 ASO today:"),
        ("top10_asn", "Top 10 ASN today:"),
    ]:
        body.append("")
        body.append(cat_title)
        items = stats.get(cat_key, [])
        if items:
            max_item_len = len(cat_title.split()[2])
            max_item_count_len = 5
            for item, count in items:
                max_item_len = max(max_item_len, len(item))
                max_item_count_len = max(max_item_count_len, len(str(count)))
            for idx, (item, count) in enumerate(items, 1):
                body.append(
                    f"  {idx:>2d}. {item:<{max_item_len}}  "
                    f"{str(count):>{max_item_count_len}} times")
        else:
            body.append(f"  (no {cat_title.split()[2].lower()} stats for today)")

    body.append("")
    body.append("--- Reverse DNS Lookup Failure Summary ---")
    total_rev = stats.get("total_rev_dns_failures", 0)
    err_counts = stats.get("rev_dns_error_counts", [])
    body.append(f"Total failed reverse lookups today: {total_rev}")
    if total_rev > 0 and err_counts:
        body.append("Breakdown by error type:")
        max_error_str_len = max(len(e) for e, _ in err_counts)
        max_error_count_len = max(len(str(c)) for _, c in err_counts)
        for err_str, count in err_counts:
            body.append(
                f"  {err_str:<{max_error_str_len}} : "
                f"{str(count):>{max_error_count_len}}")
    else:
        body.append(
            "  (No reverse DNS lookup failures recorded for today or "
            "breakdown not available)")

    body.append("")
    body.append(f"Total CSV file size: {stats['csv_size_k_str']}")
    body.append(f"Total CSV lines:     {stats['csv_lines_str']}")
    body.append("")
    body.append(f"Please see attached: {csv_filename}")
    body.append("")
    body.append(
        "For more details and documentation, visit: "
        "https://github.com/monozoide/MailLogSentinel/blob/main/README.md")
    return "\n".join(header + body) + "\n"


FULL = dict(
    total_today=55,
    top10_today=[
        (("user@example.com", "111.222.11.22", "host.attacker.cn", "CN"), 5),
        (("admin@example.com", "22.33.44.55", "another.host.ru", "RU"), 4),
        (("testuser", "123.123.1.2", "unknown.host.br", "BR"), 3),
        (("user.1@domain.tld", "220.182.17.122", "null", "N/A"), 1),
    ],
    top10_usernames=[
        ("user@example.com", 10), ("user.1@domain.tld", 6), ("contact", 2)],
    top10_countries=[("CN", 6), ("RU", 1)],
    top10_aso=[
        ("CHINA UNICOM China169 Backbone", 2),
        ("PJSC Moscow city telephone network", 1)],
    top10_asn=[("4837", 2), ("134810", 112)],
    total_rev_dns_failures=26,
    rev_dns_error_counts=[("Errno 1", 24), ("Errno 2", 2)],
    csv_size_k_str="241.1K",
    csv_lines_str="3613",
)

EMPTY = dict(
    total_today=0, top10_today=[], top10_usernames=[], top10_countries=[],
    top10_aso=[], top10_asn=[], total_rev_dns_failures=0,
    rev_dns_error_counts=[], csv_size_k_str="0.0K", csv_lines_str="0",
)

if __name__ == "__main__":
    out = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "golden_report_full.txt"), "w") as f:
        f.write(render("MailLogSentinel", "v1.0.5-A", "hourly",
                       "2025-05-28 10:30", "192.168.1.10",
                       "mail.example.com", FULL, "maillogsentinel.csv"))
    with open(os.path.join(out, "golden_report_empty.txt"), "w") as f:
        f.write(render("MailLogSentinel", "v1.0.5-A", "daily",
                       "2030-01-01 00:00", "10.0.0.1",
                       "mx.test", EMPTY, "maillogsentinel.csv"))
    print("wrote golden_report_full.txt / golden_report_empty.txt")
