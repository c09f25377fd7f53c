"""Interactive CLI mirroring the reference's driver (``main.py:28-144``):
load entities → (re)build the embedding index if stale → collect query +
filters → recommend → render per-type result blocks.

Non-interactive by default so it can be driven in scripts/CI:
``python -m vectordb_hr_data_spark.cli --data hr_data.json --query "..."
[--department D] [--languages "a, b"] [--type employee|job]``.
The rendering (similarity = 1 − distance, per-type fields, reasoning
bullets) follows ``main.py:114-144``; it is presentation, not engine
(SURVEY.md A30/A32).
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> int:
    from . import config

    ap = argparse.ArgumentParser(description="HR talent / job recommender (Spark)")
    ap.add_argument("--data", required=True, help="integrated hr_data.json path")
    ap.add_argument(
        "--index", default=f"/tmp/{config.DEFAULT_INDEX_NAME}", help="index dataset path"
    )
    ap.add_argument("--query", default="소프트웨어 개발 프로젝트")  # reference default, main.py:80
    ap.add_argument("--department", default=None)
    ap.add_argument("--languages", default=None, help='comma list, e.g. "영어, 일본어"')
    ap.add_argument("--type", dest="doc_type", choices=["employee", "job"], default=None)
    ap.add_argument("--k", type=int, default=config.DEFAULT_NUM_RESULTS)
    ap.add_argument("--dim", type=int, default=64, help="embedding dim (hash embedder)")
    args = ap.parse_args(argv)

    from .embed import _hash_vec, deterministic_embedder
    from .functions.text import parse_list_input
    from .io import read_hr_json
    from .pipeline import build_index, needs_rebuild, recommend
    from .schemas import EMPLOYEE_SCHEMA, JOB_SCHEMA
    from .session import get_spark

    spark = get_spark("hr-cli")
    emp = read_hr_json(spark, args.data, "employees", EMPLOYEE_SCHEMA)
    job = read_hr_json(spark, args.data, "job_descriptions", JOB_SCHEMA)
    if emp.isEmpty() and job.isEmpty():
        print("데이터 파일에서 항목을 찾지 못했습니다.")
        return 1

    if needs_rebuild(spark, args.index, emp, job):
        print("인덱스를 (재)구축합니다...")
        build_index(emp, job, embedder=deterministic_embedder(args.dim), out_path=args.index)
    else:
        print("기존 인덱스를 재사용합니다 (변경 없음).")

    index = spark.read.parquet(args.index)
    langs = parse_list_input(args.languages) if args.languages else None
    result = recommend(
        index,
        _hash_vec(args.query, args.dim),
        args.query,
        num_results=args.k,
        department_filter=args.department,
        required_languages=langs,
        target_doc_type=args.doc_type,
    ).collect()

    if not result:
        print("조건에 맞는 추천 결과가 없습니다.")
        return 0
    for i, r in enumerate(result, 1):
        sim = f"{r['similarity']:.4f}" if r["similarity"] is not None else "N/A"
        print(f"\n--- 추천 {i} ({'직원' if r['doc_type'] == 'employee' else '채용 공고'}) ---")
        print(f"  ID: {r['id']}  |  유사도: {sim}  (거리: {r['distance']:.4f})")
        print(f"  이름/공고명: {r['name_or_title']}  |  부서: {r['department']}")
        if r["doc_type"] == "employee":
            print(f"  직무: {r['position']}  |  언어: {r['languages']}")
            print(f"  프로젝트: {r['projects']}")
        else:
            print(f"  근무지: {r['location']}  |  고용형태: {r['employment_type']}  |  경력: {r['experience_years']}")
        if r["reasoning"]:
            print("  추천 이유:")
            for reason in r["reasoning"]:
                print(f"    - {reason}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
