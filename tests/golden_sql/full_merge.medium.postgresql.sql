DELETE FROM resources w WHERE w.path IS NOT DISTINCT FROM '/things' AND NOT EXISTS (SELECT 1 FROM stg t WHERE t.path IS NOT DISTINCT FROM w.path AND t.href = w.href);

UPDATE resources w SET modified = t.modified, jsondata = t.jsondata, resourcetype = t.resourcetype FROM stg t WHERE t.path IS NOT DISTINCT FROM w.path AND t.href = w.href AND (w.jsondata <> t.jsondata OR (w.jsondata IS NULL AND t.jsondata IS NOT NULL) OR (w.jsondata IS NOT NULL AND t.jsondata IS NULL));

INSERT INTO resources (href, key, modified, jsondata, resourcetype, path) SELECT href, key, modified, jsondata, resourcetype, path FROM (SELECT href, key, modified, jsondata, resourcetype, path FROM (SELECT href, key, modified, jsondata, resourcetype, path, ROW_NUMBER() OVER (PARTITION BY path, href ORDER BY modified DESC) AS rn FROM stg) d WHERE rn = 1) s WHERE NOT EXISTS (SELECT 1 FROM resources w WHERE s.path IS NOT DISTINCT FROM w.path AND s.href = w.href);
