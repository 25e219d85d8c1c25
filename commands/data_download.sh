#!/bin/bash
# Public dataset downloads (MS MARCO + DPR resources) — canonical sources
# (reference commands/data_download.sh).
set -euo pipefail
DIR=${1:-raw_data}
mkdir -p "$DIR" && cd "$DIR"

# MS MARCO passage
wget -c https://msmarco.blob.core.windows.net/msmarcoranking/collectionandqueries.tar.gz
wget -c https://msmarco.blob.core.windows.net/msmarcoranking/triples.train.small.tar.gz
wget -c https://msmarco.blob.core.windows.net/msmarcoranking/top1000.dev.tar.gz
tar xzf collectionandqueries.tar.gz; tar xzf triples.train.small.tar.gz; tar xzf top1000.dev.tar.gz

# MS MARCO document
wget -c https://msmarco.blob.core.windows.net/msmarcoranking/msmarco-docs.tsv.gz
wget -c https://msmarco.blob.core.windows.net/msmarcoranking/msmarco-doctrain-queries.tsv.gz
wget -c https://msmarco.blob.core.windows.net/msmarcoranking/msmarco-doctrain-qrels.tsv.gz
wget -c https://msmarco.blob.core.windows.net/msmarcoranking/msmarco-test2019-queries.tsv.gz
wget -c https://trec.nist.gov/data/deep/2019qrels-docs.txt

# DPR (NQ / TriviaQA) — see github.com/facebookresearch/DPR data downloader
# for: psgs_w100.tsv, nq-train/dev.json, trivia-train/dev.json, test CSVs
