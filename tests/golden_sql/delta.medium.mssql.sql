DELETE w FROM resources w INNER JOIN stg_del t ON (t.path = w.path OR (t.path IS NULL AND w.path IS NULL)) AND t.href = w.href;

UPDATE w SET modified = t.modified, jsondata = t.jsondata, resourcetype = t.resourcetype FROM resources w INNER JOIN stg_upd t ON (t.path = w.path OR (t.path IS NULL AND w.path IS NULL)) AND t.href = w.href WHERE (w.jsondata <> t.jsondata OR (w.jsondata IS NULL AND t.jsondata IS NOT NULL) OR (w.jsondata IS NOT NULL AND t.jsondata IS NULL));

INSERT INTO resources (href, [key], modified, jsondata, resourcetype, path) SELECT href, [key], modified, jsondata, resourcetype, path FROM (SELECT href, [key], modified, jsondata, resourcetype, path FROM (SELECT href, [key], modified, jsondata, resourcetype, path, ROW_NUMBER() OVER (PARTITION BY path, href ORDER BY modified DESC) AS rn FROM stg_upd) d WHERE rn = 1) s WHERE NOT EXISTS (SELECT 1 FROM resources w WHERE (s.path = w.path OR (s.path IS NULL AND w.path IS NULL)) AND s.href = w.href);
