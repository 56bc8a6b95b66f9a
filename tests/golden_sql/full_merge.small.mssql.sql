DELETE w FROM resources w WHERE 1=1 AND NOT EXISTS (SELECT 1 FROM stg t WHERE t.href = w.href);

UPDATE w SET modified = t.modified, jsondata = t.jsondata, resourcetype = t.resourcetype FROM resources w INNER JOIN stg t ON t.href = w.href WHERE (w.jsondata <> t.jsondata OR (w.jsondata IS NULL AND t.jsondata IS NOT NULL) OR (w.jsondata IS NOT NULL AND t.jsondata IS NULL));

INSERT INTO resources (href, [key], modified, jsondata, resourcetype) SELECT href, [key], modified, jsondata, resourcetype FROM (SELECT href, [key], modified, jsondata, resourcetype FROM (SELECT href, [key], modified, jsondata, resourcetype, ROW_NUMBER() OVER (PARTITION BY href ORDER BY modified DESC) AS rn FROM stg) d WHERE rn = 1) s WHERE NOT EXISTS (SELECT 1 FROM resources w WHERE s.href = w.href);
